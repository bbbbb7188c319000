"""Serving engine + multi-host helper tests."""

import numpy as np

from radzero_tpu.data.processing import BlipStyleImageProcessor
from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
from radzero_tpu.eval.scorer import ZeroShotScorer
from radzero_tpu.eval.serving import ServingEngine
from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import init_radzero
from radzero_tpu.parallel.mesh import create_mesh
from radzero_tpu.parallel.multihost import (
    local_batch_to_global,
    process_offset,
    sync,
)

import jax
import jax.numpy as jnp

D = 32
CFG = RadZeroConfig(
    vision=ViTConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
        patch_size=14, pretrain_img_size=28, img_size=28,
    ),
    text=TextConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        vocab_size=5003, max_position_embeddings=40,
    ),
    align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
    loss=LossConfig(hidden_dim=D),
)


def test_serving_engine_microbatching():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    with ServingEngine(
        params, CFG, BlipStyleImageProcessor(size=28),
        WhitespaceHashTokenizer(vocab_size=5003, max_length=10),
        max_batch=4, max_delay_ms=20, dtype=jnp.float32,
    ) as engine:
        engine.register_prompt_set("cls", ["There is Edema", "There is Mass"])
        engine.warmup(image_hw=(40, 30))

        futs = [
            engine.submit(
                rng.integers(0, 256, (40, 30, 3), dtype=np.uint8), "cls",
                want_maps=(i % 2 == 0),
            )
            for i in range(6)
        ]
        results = [f.result(timeout=120) for f in futs]

        # full-resolution variant projects back to origin size
        full = engine.submit(
            rng.integers(0, 256, (40, 30, 3), dtype=np.uint8), "cls", want_maps="full"
        ).result(timeout=120)
        assert full["similarity_maps"].shape == (2, 40, 30)

    for i, r in enumerate(results):
        assert r["probs"].shape == (2,)
        assert np.all((r["probs"] >= 0) & (r["probs"] <= 1))
        if i % 2 == 0:
            # default maps response: patch resolution (28/14 = 2x2 grid)
            assert r["similarity_maps"].shape == (2, 2, 2)
        else:
            assert r["similarity_maps"] is None


def test_serving_device_normalize_matches_host_normalize():
    """uint8 upload + on-device normalise must be bit-equivalent to the
    host f32 pipeline (both share the PIL resize -> u8 intermediate)."""
    params = init_radzero(jax.random.PRNGKey(1), CFG)
    proc = BlipStyleImageProcessor(size=28)
    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (40, 30, 3), dtype=np.uint8) for _ in range(3)]

    def run(device_normalize):
        with ServingEngine(
            params, CFG, proc, tok, max_batch=4, max_delay_ms=20,
            dtype=jnp.float32, device_normalize=device_normalize,
            host_backend="pil",
        ) as engine:
            engine.register_prompt_set("cls", ["There is Edema", "There is Mass"])
            futs = [engine.submit(im, "cls", want_maps=True) for im in imgs]
            return [f.result(timeout=120) for f in futs]

    on = run(True)
    off = run(False)
    for a, b in zip(on, off):
        np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            a["similarity_maps"], b["similarity_maps"], rtol=1e-5, atol=1e-6
        )


def test_serving_jpeg_bytes_native_path():
    """Raw JPEG bytes in -> probs + full-resolution maps out, decoded and
    resized by the native C++ library."""
    import io

    import pytest
    from PIL import Image

    from radzero_tpu.data import native

    if not native.available():
        pytest.skip("native preprocessing library not built")

    params = init_radzero(jax.random.PRNGKey(2), CFG)
    proc = BlipStyleImageProcessor(size=28)
    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    rng = np.random.default_rng(2)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)).save(
        buf, "JPEG", quality=95
    )
    jpeg = buf.getvalue()

    with ServingEngine(
        params, CFG, proc, tok, max_batch=2, max_delay_ms=20,
        dtype=jnp.float32, host_backend="native",
    ) as engine:
        engine.register_prompt_set("cls", ["There is Edema"])
        r_patch = engine.submit(jpeg, "cls", want_maps=True).result(timeout=120)
        r_full = engine.submit(jpeg, "cls", want_maps="full").result(timeout=120)

    assert r_patch["probs"].shape == (1,)
    assert r_patch["similarity_maps"].shape == (1, 2, 2)
    assert np.all(np.isfinite(r_patch["similarity_maps"]))
    # origin dims recovered from the JPEG header (64, 48)
    assert r_full["similarity_maps"].shape == (1, 64, 48)


def test_serving_fast_scale_decode():
    """Opt-in DCT-domain scaled decode: large smooth source -> probs stay
    close to the full-decode path (box-filtered downscale shifts pixels
    only slightly on smooth content)."""
    import io

    import pytest
    from PIL import Image

    from radzero_tpu.data import native

    if not native.available():
        pytest.skip("native preprocessing library not built")

    params = init_radzero(jax.random.PRNGKey(2), CFG)
    proc = BlipStyleImageProcessor(size=28)
    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    yy, xx = np.mgrid[0:256, 0:256]
    smooth = ((yy + xx) / 2).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(np.stack([smooth] * 3, -1)).save(buf, "JPEG", quality=95)
    jpeg = buf.getvalue()

    # the scaled decode really kicks in (256/28 -> 1/8 DCT decode)
    full = native.decode_resize_u8(jpeg, 28, 28)
    fast = native.decode_resize_u8(jpeg, 28, 28, fast_scale=True)
    assert not np.array_equal(full, fast)
    assert np.mean(np.abs(full.astype(np.int16) - fast.astype(np.int16))) < 3.0

    probs = {}
    for flag in (False, True):
        with ServingEngine(
            params, CFG, proc, tok, max_batch=2, max_delay_ms=20,
            dtype=jnp.float32, host_backend="native", fast_scale=flag,
        ) as engine:
            engine.register_prompt_set("cls", ["There is Edema"])
            probs[flag] = engine.submit(jpeg, "cls").result(timeout=120)["probs"]
    np.testing.assert_allclose(probs[True], probs[False], atol=0.05)


def test_collect_drains_backlog_at_zero_delay():
    """max_delay bounds WAITING for unarrived requests, not draining the
    existing backlog: at max_delay=0 a queued backlog must still come out
    as full max_batch batches (regression: batch-1 dispatches collapsed
    saturated throughput 24x in the round-4 bench sweep)."""
    import concurrent.futures as cf
    import queue as queue_mod

    from radzero_tpu.eval.serving import _Request

    eng = ServingEngine.__new__(ServingEngine)
    eng._queue = queue_mod.Queue()
    eng._held = None
    eng.max_batch = 4
    eng.max_delay = 0.0

    def req(pset="cls"):
        return _Request(np.zeros((2, 2, 3), np.uint8), (2, 2), pset, "none", cf.Future())

    for _ in range(10):
        eng._queue.put(req())
    sizes = []
    while True:
        batch = eng._collect()
        if not batch:
            break
        sizes.append(len(batch))
    assert sizes == [4, 4, 2]

    # a prompt-set boundary still flushes the current set first
    for p in ["a", "a", "b", "b", "b"]:
        eng._queue.put(req(p))
    first = eng._collect()
    second = eng._collect()
    assert [r.prompt_set for r in first] == ["a", "a"]
    assert [r.prompt_set for r in second] == ["b", "b", "b"]


def test_mismatched_prompt_set_not_starved():
    """A request whose prompt set mismatches the batch being assembled is
    HELD as the next batch's first, not re-enqueued at the tail — at the
    tail, sustained traffic of the other set would cycle it behind fresh
    arrivals forever (regression: greedy drain + put-back starvation)."""
    import concurrent.futures as cf
    import queue as queue_mod

    from radzero_tpu.eval.serving import _Request

    eng = ServingEngine.__new__(ServingEngine)
    eng._queue = queue_mod.Queue()
    eng._held = None
    eng.max_batch = 2
    eng.max_delay = 0.0

    def req(pset):
        return _Request(np.zeros((2, 2, 3), np.uint8), (2, 2), pset, "none", cf.Future())

    # one B among sustained A traffic; after each collect more A arrives
    for p in ["a", "b", "a"]:
        eng._queue.put(req(p))
    first = eng._collect()                    # [a] — b goes to the held slot
    assert [r.prompt_set for r in first] == ["a"]
    eng._queue.put(req("a"))                  # fresh A lands behind b
    second = eng._collect()                   # b MUST lead this batch
    assert second[0].prompt_set == "b"
    third = eng._collect()
    assert [r.prompt_set for r in third] == ["a", "a"]

    # close() must fail a held request's future, never leak it
    eng._queue.put(req("a"))
    eng._queue.put(req("b"))
    got = eng._collect()
    assert [r.prompt_set for r in got] == ["a"]
    held = eng._held
    assert held is not None
    eng._fail_queued()
    assert held.future.done() and isinstance(held.future.exception(), RuntimeError)


def test_multihost_helpers_single_process():
    mesh = create_mesh({"data": 8})
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    out = local_batch_to_global(batch, mesh)
    assert out["x"].shape == (16, 1)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert process_offset(4) == 0  # single process
    sync()  # no-op single process


def test_scorer_with_mesh_matches_single_device():
    """Sharded eval over an 8-device mesh must match single-device logits."""
    import jax.numpy as jnp
    from PIL import Image
    import tempfile, os

    params = init_radzero(jax.random.PRNGKey(3), CFG)
    proc = BlipStyleImageProcessor(size=28)
    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    rng = np.random.default_rng(3)

    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(8):
            p = os.path.join(d, f"{i}.png")
            Image.fromarray(rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)).save(p)
            paths.append(p)

        def load(p):
            return Image.open(p)

        prompts = ["There is Edema", "There is Mass"]
        s1 = ZeroShotScorer(params, CFG, proc, tok, batch_size=8, dtype=jnp.float32)
        l1, _ = s1.score(paths, load, prompts)

        mesh = create_mesh({"data": 8})
        s8 = ZeroShotScorer(params, CFG, proc, tok, batch_size=8, dtype=jnp.float32, mesh=mesh)
        l8, _ = s8.score(paths, load, prompts)

    np.testing.assert_allclose(l8, l1, rtol=1e-4, atol=1e-5)



def test_scorer_device_normalize_matches_host_path():
    """ZeroShotScorer uint8 fast path == host fp32 path (shared PIL
    resize -> u8 intermediate)."""
    import tempfile, os
    from PIL import Image

    params = init_radzero(jax.random.PRNGKey(4), CFG)
    proc = BlipStyleImageProcessor(size=28)
    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    rng = np.random.default_rng(4)

    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(3):
            p = os.path.join(d, f"{i}.png")
            Image.fromarray(rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)).save(p)
            paths.append(p)

        def load(p):
            return Image.open(p)

        prompts = ["There is Edema", "There is Mass"]
        host = ZeroShotScorer(params, CFG, proc, tok, batch_size=4, dtype=jnp.float32)
        lh, sh = host.score(paths, load, prompts, need_scores=True)
        dev = ZeroShotScorer(params, CFG, proc, tok, batch_size=4,
                             dtype=jnp.float32, device_normalize=True)
        ld, sd = dev.score(paths, load, prompts, need_scores=True)

    np.testing.assert_allclose(ld, lh, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sd, sh, rtol=1e-5, atol=1e-5)


def test_serving_grayscale_channel_upload_matches_rgb():
    """channels=1 (grayscale upload, device broadcast) must match the RGB
    path exactly for grayscale sources."""
    import io

    from PIL import Image

    params = init_radzero(jax.random.PRNGKey(5), CFG)
    proc = BlipStyleImageProcessor(size=28)
    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (40, 30), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "JPEG", quality=95)
    jpeg = buf.getvalue()

    def run(channels):
        with ServingEngine(
            params, CFG, proc, tok, max_batch=2, max_delay_ms=20,
            dtype=jnp.float32, channels=channels,
        ) as engine:
            engine.register_prompt_set("cls", ["There is Edema"])
            return engine.submit(jpeg, "cls", want_maps=True).result(timeout=120)

    r1 = run(1)
    r3 = run(3)
    np.testing.assert_allclose(r1["probs"], r3["probs"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        r1["similarity_maps"], r3["similarity_maps"], rtol=1e-5, atol=1e-6
    )


def test_serving_engine_with_mesh_matches_single_device():
    """Mesh-sharded serving (params replicated, batch sharded on 'data')
    must match the single-device engine."""
    params = init_radzero(jax.random.PRNGKey(6), CFG)
    proc = BlipStyleImageProcessor(size=28)
    tok = WhitespaceHashTokenizer(vocab_size=5003, max_length=10)
    rng = np.random.default_rng(6)
    imgs = [rng.integers(0, 256, (40, 30, 3), dtype=np.uint8) for _ in range(8)]

    def run(mesh):
        with ServingEngine(
            params, CFG, proc, tok, max_batch=8, max_delay_ms=30,
            dtype=jnp.float32, mesh=mesh,
        ) as engine:
            engine.register_prompt_set("cls", ["There is Edema", "There is Mass"])
            futs = [engine.submit(im, "cls", want_maps=True) for im in imgs]
            return [f.result(timeout=120) for f in futs]

    single = run(None)
    sharded = run(create_mesh({"data": 8}))
    for a, b in zip(sharded, single):
        np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            a["similarity_maps"], b["similarity_maps"], rtol=1e-4, atol=1e-4
        )


def test_close_fails_queued_futures_promptly():
    """close() must not abandon requests still sitting in the submit
    queue: their futures get an 'engine shutting down' error instead of
    blocking callers until their own request_timeout."""
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    engine = ServingEngine(
        params, CFG, BlipStyleImageProcessor(size=28),
        WhitespaceHashTokenizer(vocab_size=5003, max_length=10),
        max_batch=4, max_delay_ms=20, dtype=jnp.float32,
    )
    engine.register_prompt_set("cls", ["There is Edema"])
    # Stop the decode stage first so the requests below stay queued.
    # submit() now fails fast once _stop is set (see
    # test_review_fixes_r3.py), so enqueue the raw requests directly —
    # the scenario close() must handle is requests that raced INTO the
    # queue before shutdown and were never picked up.
    engine._stop.set()
    engine._worker.join(timeout=10)
    import concurrent.futures as cf

    from radzero_tpu.eval.serving import _Request

    futs = []
    for _ in range(3):
        fut = cf.Future()
        img = rng.integers(0, 256, (28, 28, 3), dtype=np.uint8)
        engine._queue.put(_Request(img, (28, 28), "cls", "none", fut))
        futs.append(fut)
    engine.close()
    for f in futs:
        with np.testing.assert_raises(RuntimeError):
            f.result(timeout=5)
        assert isinstance(f.exception(timeout=0), RuntimeError)

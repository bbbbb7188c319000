"""HTTP serving front-end: JPEG in over HTTP -> probs/maps JSON out."""

import io
import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from radzero_tpu.data.processing import BlipStyleImageProcessor
from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
from radzero_tpu.eval.server import EngineServer
from radzero_tpu.eval.serving import ServingEngine
from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import init_radzero

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


def _post(url, data, ctype):
    req = urllib.request.Request(url, data=data, headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def test_http_predict_and_health():
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    engine = ServingEngine(
        params, CFG, BlipStyleImageProcessor(size=28),
        WhitespaceHashTokenizer(vocab_size=5003, max_length=10),
        max_batch=4, max_delay_ms=20, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (40, 30), dtype=np.uint8), "L").save(
        buf, "JPEG", quality=95
    )
    jpeg = buf.getvalue()

    with engine, EngineServer(
        engine, {"cls": ["There is Edema", "There is Mass"]}
    ) as server:
        port = server.start(host="127.0.0.1")
        base = f"http://127.0.0.1:{port}"

        health = json.loads(urllib.request.urlopen(f"{base}/healthz").read())
        assert health == {"status": "ok", "prompt_sets": ["cls"]}

        out = _post(f"{base}/predict?prompt_set=cls&maps=patch", jpeg, "image/jpeg")
        assert out["prompts"] == ["There is Edema", "There is Mass"]
        assert len(out["probs"]) == 2
        assert all(0.0 <= p <= 1.0 for p in out["probs"])
        maps = np.asarray(out["similarity_maps"])
        assert maps.shape == (2, 2, 2)

        # decoded-array JSON body variant, no maps
        img = rng.integers(0, 256, (40, 30, 3)).tolist()
        out2 = _post(
            f"{base}/predict?prompt_set=cls",
            json.dumps({"image": img}).encode(), "application/json",
        )
        assert out2["similarity_maps"] is None

        # error paths
        try:
            _post(f"{base}/predict?prompt_set=nope", jpeg, "image/jpeg")
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400


def test_http_server_under_concurrent_load():
    """Load test (VERDICT r2 #7): many concurrent HTTP clients across two
    prompt sets; every request must succeed with consistent shapes, and
    responses for identical payloads must be identical (micro-batching
    across prompt sets must not cross-contaminate)."""
    import concurrent.futures as cf

    params = init_radzero(jax.random.PRNGKey(1), CFG)
    engine = ServingEngine(
        params, CFG, BlipStyleImageProcessor(size=28),
        WhitespaceHashTokenizer(vocab_size=5003, max_length=10),
        max_batch=4, max_delay_ms=5, dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    jpegs = []
    for i in range(4):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, (40, 30), dtype=np.uint8), "L"
        ).save(buf, "JPEG", quality=95)
        jpegs.append(buf.getvalue())

    sets = {"a": ["There is Edema"], "b": ["There is Mass", "No finding"]}
    with engine, EngineServer(engine, sets) as server:
        port = server.start(host="127.0.0.1")
        base = f"http://127.0.0.1:{port}"

        def one(i):
            ps = "a" if i % 2 == 0 else "b"
            img_i = (i // 2) % 4
            out = _post(
                f"{base}/predict?prompt_set={ps}", jpegs[img_i], "image/jpeg"
            )
            return ps, img_i, out["probs"]

        with cf.ThreadPoolExecutor(max_workers=16) as pool:
            results = [f.result() for f in [pool.submit(one, i) for i in range(48)]]

    by_key = {}
    for ps, img_i, probs in results:
        assert len(probs) == len(sets[ps])
        assert all(0.0 <= p <= 1.0 for p in probs)
        key = (ps, img_i)
        if key in by_key:
            np.testing.assert_allclose(probs, by_key[key], rtol=1e-5, atol=1e-6)
        else:
            by_key[key] = probs
    assert len(by_key) == 8  # both prompt sets x all 4 images exercised

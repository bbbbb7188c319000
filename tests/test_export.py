"""AOT export bundle: serialize -> reload -> identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.eval.export import export_zero_shot, load_zero_shot
from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import compute_logits, init_radzero

D = 32
CFG = RadZeroConfig(
    vision=ViTConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
        patch_size=14, pretrain_img_size=28, img_size=28,
    ),
    text=TextConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        vocab_size=101, max_position_embeddings=40,
    ),
    align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
    loss=LossConfig(hidden_dim=D),
)


def test_export_roundtrip(tmp_path):
    params = init_radzero(jax.random.PRNGKey(0), CFG)
    bundle = export_zero_shot(
        params, CFG, str(tmp_path), batch_size=2, n_prompts=3, max_tokens=8,
        dtype=jnp.float32,
    )

    runner, meta = load_zero_shot(bundle)
    assert meta["batch_size"] == 2 and meta["img_size"] == 28

    rng = np.random.default_rng(0)
    pv = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 101, (3, 8)), jnp.int32)
    mask = jnp.ones((3, 8), jnp.int32)

    logits, scores = runner(pv, ids, mask)
    ref = compute_logits(params, CFG, pv, ids, mask, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref["logits"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref["similarity_scores"]), rtol=1e-4, atol=1e-4
    )


def test_bundle_cold_start_serving_engine(tmp_path):
    """AOT bundle (uint8 grayscale contract baked in) -> ServingEngine
    cold start -> same probs/maps as the live-params engine."""
    import io

    from PIL import Image

    from radzero_tpu.data.processing import BlipStyleImageProcessor
    from radzero_tpu.data.tokenizer import WhitespaceHashTokenizer
    from radzero_tpu.eval.serving import ServingEngine

    params = init_radzero(jax.random.PRNGKey(1), CFG)
    proc = BlipStyleImageProcessor(size=28)
    tok = WhitespaceHashTokenizer(vocab_size=101, max_length=8)

    bundle = export_zero_shot(
        params, CFG, str(tmp_path), batch_size=2, n_prompts=1, max_tokens=8,
        dtype=jnp.float32, from_uint8=True, channels=1,
        image_mean=proc.mean, image_std=proc.std,
    )

    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, (40, 30), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "JPEG", quality=95)
    jpeg = buf.getvalue()

    with ServingEngine.from_bundle(bundle, proc, tok, max_delay_ms=20) as engine:
        assert engine.max_batch == 2 and engine.channels == 1
        assert engine.device_normalize
        engine.register_prompt_set("cls", ["There is Edema"])
        got = engine.submit(jpeg, "cls", want_maps=True).result(timeout=120)

    with ServingEngine(
        params, CFG, proc, tok, max_batch=2, max_delay_ms=20,
        dtype=jnp.float32, channels=1,
    ) as ref_engine:
        ref_engine.register_prompt_set("cls", ["There is Edema"])
        ref = ref_engine.submit(jpeg, "cls", want_maps=True).result(timeout=120)

    np.testing.assert_allclose(got["probs"], ref["probs"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        got["similarity_maps"], ref["similarity_maps"], rtol=1e-5, atol=1e-6
    )

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

"""Multi-loss training forward: RadZeroLoss + OpenClipLoss / OpenSigLipLoss
with ratios (ref modeling.py:229-274 loss loop + loss_ratio)."""

import jax
import numpy as np

from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import forward_train, init_radzero

D = 32
CFG = RadZeroConfig(
    vision=ViTConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
        patch_size=14, pretrain_img_size=28, img_size=28,
    ),
    text=TextConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        vocab_size=101, max_position_embeddings=40, use_text_projection=True,
    ),
    align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
    loss=LossConfig(hidden_dim=D),
)


def _batch(rng, B=2):
    S = B * 2
    return {
        "pixel_values": rng.standard_normal((B, 28, 28, 3)).astype(np.float32),
        "input_ids": rng.integers(3, 101, (S, 8)).astype(np.int32),
        "attention_mask": np.ones((S, 8), np.int32),
        "group_map": np.repeat(np.arange(B), 2).astype(np.int32),
        "row_mask": np.ones(S, np.float32),
        "random_input_ids": rng.integers(3, 101, (B, 8)).astype(np.int32),
        "random_attention_mask": np.ones((B, 8), np.int32),
    }


def test_radzero_plus_clip_and_siglip_losses():
    params = init_radzero(
        jax.random.PRNGKey(0), CFG,
        loss_apply=("RadZeroLoss", "OpenClipLoss", "OpenSigLipLoss"),
    )
    # text projector makes text features 2*hidden wide; the RadZero loss
    # slices the second half (losses.py:144-146) — exercised here
    assert "text_projector" in params
    batch = _batch(np.random.default_rng(0))
    out = forward_train(
        params, CFG, batch,
        loss_ratio={"RadZeroLoss": 1.0, "OpenClipLoss": 0.5, "OpenSigLipLoss": 0.25},
    )
    losses = out["losses"]
    for k in ("t2i_loss", "radzero_loss", "clip_loss", "siglip_loss", "loss"):
        assert k in losses and np.isfinite(float(losses[k])), k
    expected = (
        float(losses["radzero_loss"])
        + 0.5 * float(losses["clip_loss"])
        + 0.25 * float(losses["siglip_loss"])
    )
    np.testing.assert_allclose(float(losses["loss"]), expected, rtol=1e-5)

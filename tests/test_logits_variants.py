"""compute_logits alternates (cls_alignment / global_alignment,
modeling.py:330-353) and the separate attention temperature
(losses.py:57-62)."""

import dataclasses

import jax
import numpy as np

from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import compute_logits, init_radzero

D = 32
BASE = RadZeroConfig(
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


def _inputs(rng, B=2, N=3, L=8):
    return (
        rng.standard_normal((B, 28, 28, 3)).astype(np.float32),
        rng.integers(3, 101, (N, L)).astype(np.int32),
        np.ones((N, L), np.int32),
    )


def test_cls_alignment_no_projector():
    # note: cls_alignment requires text feature dim == hidden (i.e. no
    # 2*hidden projector), mirroring the reference's dim contract
    # (modeling.py:337-338)
    text = dataclasses.replace(BASE.text, use_text_projection=False)
    cfg = dataclasses.replace(BASE, text=text, compute_logits_type="cls_alignment")
    params = init_radzero(jax.random.PRNGKey(1), cfg)
    pv, ids, mask = _inputs(np.random.default_rng(1))
    out = compute_logits(params, cfg, pv, ids, mask)
    assert out["logits"].shape == (2, 3)
    assert "similarity_scores" not in out
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_global_alignment_branch():
    """global_alignment: image_features (2D) @ text (2D via projector),
    plus einsum patch-text maps over the second hidden half
    (modeling.py:340-353)."""
    cfg = dataclasses.replace(BASE, compute_logits_type="global_alignment")
    params = init_radzero(jax.random.PRNGKey(2), cfg)
    pv, ids, mask = _inputs(np.random.default_rng(2))
    out = compute_logits(params, cfg, pv, ids, mask)
    assert out["logits"].shape == (2, 3)
    n_patches = (28 // 14) ** 2
    assert out["similarity_scores"].shape == (2, 3, n_patches)


def test_separate_attn_temperature():
    loss = dataclasses.replace(BASE.loss, attn_temperature=0.2)
    cfg = dataclasses.replace(BASE, loss=loss)
    params = init_radzero(jax.random.PRNGKey(3), cfg)
    assert "log_attn_temperature" in params["loss_fns"]["RadZeroLoss"]
    np.testing.assert_allclose(
        np.asarray(params["loss_fns"]["RadZeroLoss"]["log_attn_temperature"]),
        [np.log(0.2)], rtol=1e-6,
    )
    pv, ids, mask = _inputs(np.random.default_rng(3))
    out = compute_logits(params, cfg, pv, ids, mask)
    # attn temp scales the similarity map: scores/tau_attn (losses.py:177-181)
    out_ref = compute_logits(init_radzero(jax.random.PRNGKey(3), BASE), BASE, pv, ids, mask)
    ratio = np.asarray(out["similarity_scores"]) / np.asarray(out_ref["similarity_scores"])
    np.testing.assert_allclose(ratio, np.full_like(ratio, 0.07 / 0.2), rtol=1e-3)

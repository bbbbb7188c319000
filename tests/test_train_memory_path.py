"""Correctness guards for the training memory optimisations:
stop-gradient above the frozen tower and text-tower remat must not
change losses or gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.models.configuration import (
    AlignConfig,
    LossConfig,
    RadZeroConfig,
    TextConfig,
    ViTConfig,
)
from radzero_tpu.models.radzero import forward_train, init_radzero
from radzero_tpu.train.optim import merge_params, partition_params

D = 32
CFG = RadZeroConfig(
    vision=ViTConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
        patch_size=14, pretrain_img_size=28, img_size=28,
    ),
    text=TextConfig(
        hidden_size=D, num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        vocab_size=101, max_position_embeddings=40,
    ),
    align=AlignConfig(hidden_size=D, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0),
    loss=LossConfig(hidden_dim=D),
)


def _batch(rng):
    return {
        "pixel_values": rng.standard_normal((2, 28, 28, 3)).astype(np.float32),
        "input_ids": rng.integers(3, 101, (4, 8)).astype(np.int32),
        "attention_mask": np.ones((4, 8), np.int32),
        "group_map": np.array([0, 0, 1, 1], np.int32),
        "row_mask": np.ones(4, np.float32),
    }


def _grads(stop, remat, cfg=CFG):
    params = init_radzero(jax.random.PRNGKey(0), cfg)
    trainable, frozen = partition_params(params, ["align_transformer", "text_model", "loss_fns"])
    batch = _batch(np.random.default_rng(0))

    def loss_fn(tr):
        p = merge_params(tr, frozen)
        out = forward_train(p, cfg, batch, stop_vision_gradient=stop, remat=remat)
        return out["losses"]["loss"]

    return jax.value_and_grad(loss_fn)(trainable)


def test_stop_vision_gradient_preserves_trainable_grads():
    l0, g0 = _grads(stop=False, remat=False)
    l1, g1 = _grads(stop=True, remat=False)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_remat_preserves_grads():
    l0, g0 = _grads(stop=True, remat=False)
    l1, g1 = _grads(stop=True, remat=True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_save_attn_remat_policy_preserves_grads():
    """ViTConfig.remat_policy='save_attn' (attention output kept live
    under remat) must be a pure scheduling change: same loss, same
    gradients as the full-recompute default."""
    import dataclasses

    l0, g0 = _grads(stop=True, remat=True)
    cfg = dataclasses.replace(
        CFG, align=dataclasses.replace(CFG.align, remat_policy="save_attn")
    )
    l1, g1 = _grads(stop=True, remat=True, cfg=cfg)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_flash_attention_fast_softmax_matches_stable():
    """stable=False (exp2, no max pass) must match the stable softmax."""
    from radzero_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 70, 2, 32)), jnp.float32) for _ in range(3)
    )
    out_stable = flash_attention(q, k, v, None, True)
    out_fast = flash_attention(q, k, v, None, False)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_stable), rtol=1e-4, atol=1e-5
    )

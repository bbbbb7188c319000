"""Fused serving-path ViT layer kernels vs the unfused reference path.

fused_preattn / fused_postattn (ops/fused_layer.py) must reproduce the
xla layer math (fp32 LN/GELU, same eps/layerscale semantics) — these are
the serving hot path behind the 5x north star, so parity is asserted at
layer level AND through the full tower with lane padding + masked keys.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.models.configuration import ViTConfig
from radzero_tpu.models.vit import (
    dinov2_layer,
    init_vit,
    init_vit_layers,
    vit_forward,
)


def _layer_params(key, cfg):
    stack = init_vit_layers(key, dataclasses.replace(cfg, num_hidden_layers=1))
    p = jax.tree.map(lambda a: a[0], stack)
    # non-trivial LN/LS so fusion bugs can't hide behind identities
    p["ln1"]["scale"] = p["ln1"]["scale"] * 1.1 + 0.03
    p["ln2"]["bias"] = p["ln2"]["bias"] + 0.05
    p["ls1"] = p["ls1"] * 0.7
    p["ls2"] = p["ls2"] * 1.3
    return p


def test_fused_layer_matches_xla_layer():
    cfg_x = ViTConfig(hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
                      mlp_ratio=2.0, patch_size=14, pretrain_img_size=28,
                      img_size=28, attn_impl="xla")
    cfg_f = dataclasses.replace(cfg_x, attn_impl="fused")
    p = _layer_params(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 37, 64)), jnp.float32)

    ref = dinov2_layer(x, p, cfg_x)
    # fused path runs on the lane-padded sequence like the real tower
    x_pad = jnp.pad(x, ((0, 0), (0, 128 - 37), (0, 0)))
    out = dinov2_layer(x_pad, p, cfg_f, real_len=37)[:, :37]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_tower_matches_flash_tower():
    cfg_flash = ViTConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                          mlp_ratio=2.0, patch_size=14, pretrain_img_size=28,
                          img_size=42, attn_impl="flash")
    cfg_fused = dataclasses.replace(cfg_flash, attn_impl="fused")
    params = init_vit(jax.random.PRNGKey(1), cfg_flash)
    rng = np.random.default_rng(1)
    pv = jnp.asarray(rng.standard_normal((2, 42, 42, 3)), jnp.float32)

    ref = vit_forward(params, cfg_flash, pv)
    out = vit_forward(params, cfg_fused, pv)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_kernels_odd_rows_padded():
    """Row counts not divisible by the block size are padded internally."""
    from radzero_tpu.ops.fused_layer import fused_postattn, fused_preattn

    rng = np.random.default_rng(2)
    n, d, f = 37, 32, 64
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal((3 * d,)) * 0.1, jnp.float32)
    s = jnp.asarray(1.0 + rng.standard_normal((d,)) * 0.1, jnp.float32)
    bln = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)

    qkv = fused_preattn(x, s, bln, w3, b3, block_n=16)
    assert qkv.shape == (n, 3 * d)

    from radzero_tpu.ops.layers import layer_norm

    ref = layer_norm(x[None], {"scale": s, "bias": bln}, 1e-6)[0] @ w3 + b3
    np.testing.assert_allclose(np.asarray(qkv), np.asarray(ref), rtol=2e-5, atol=2e-5)

    wo = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    ls1 = jnp.full((d,), 0.9, jnp.float32)
    ls2 = jnp.full((d,), 1.1, jnp.float32)

    out = fused_postattn(x, a, wo, bo, ls1, s, bln, w1, b1, w2, b2, ls2, block_n=16)

    from radzero_tpu.ops.layers import gelu

    y = x + ls1 * (a @ wo + bo)
    h = gelu(layer_norm(y[None], {"scale": s, "bias": bln}, 1e-6)[0] @ w1 + b1)
    ref2 = y + ls2 * (h @ w2 + b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref2), rtol=2e-5, atol=2e-5)


def test_attn_packed_pads_unaligned_standalone_seq():
    """The shared pad/mask guard: a standalone (real_len=None) sequence
    with non-lane-aligned L must reach the packed kernels lane-padded
    with the real length as the key mask — the alt-vision-tower ->
    fused align adapter path (CLIP L=577, SAM L=4097) lands here."""
    from radzero_tpu.models.vit import _attn_packed

    calls = {}

    def fake(qkv, n_heads, kv_len):
        calls["shape"], calls["kv_len"] = qkv.shape, kv_len
        return qkv[..., : qkv.shape[-1] // 3]

    out = _attn_packed(jnp.zeros((2, 37, 48)), 4, None, fake)
    assert calls["shape"] == (2, 128, 48) and calls["kv_len"] == 37
    assert out.shape == (2, 37, 16)

    # lane-aligned standalone and pre-padded sequences pass through
    _attn_packed(jnp.zeros((2, 128, 48)), 4, None, fake)
    assert calls["shape"] == (2, 128, 48) and calls["kv_len"] is None
    _attn_packed(jnp.zeros((2, 128, 48)), 4, 100, fake)
    assert calls["kv_len"] == 100


def test_all_packed_impls_handle_unaligned_standalone_seq():
    """Every packed/fused layer impl must produce xla-parity output when
    handed an unpadded, non-lane-aligned sequence with real_len=None."""
    cfg_x = ViTConfig(hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
                      mlp_ratio=2.0, patch_size=14, pretrain_img_size=28,
                      img_size=28, attn_impl="xla")
    p = _layer_params(jax.random.PRNGKey(3), cfg_x)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 37, 64)), jnp.float32)
    ref = dinov2_layer(x, p, cfg_x)
    for impl in ("fused", "fused_vjp", "packed"):
        cfg = dataclasses.replace(cfg_x, attn_impl=impl)
        out = dinov2_layer(x, p, cfg)  # real_len=None, L % 128 != 0
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5,
            err_msg=impl,
        )


def test_preattn_vjp_mixed_dtype_bias_cotangent():
    """b_qkv's cotangent must come back in b_qkv's dtype even when it
    differs from w_qkv's (mixed-precision callers)."""
    from radzero_tpu.ops.fused_layer import fused_preattn_vjp

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 16)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((16, 48)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((48,)) * 0.1, jnp.float32)
    s = jnp.ones((16,), jnp.bfloat16)
    lb = jnp.zeros((16,), jnp.bfloat16)

    def loss(x, s, lb, w, b):
        return jnp.sum(fused_preattn_vjp(x, s, lb, w, b, 1e-6).astype(jnp.float32))

    g = jax.grad(loss, argnums=(3, 4))(x, s, lb, w, b)
    assert g[0].dtype == jnp.bfloat16  # dw follows w_qkv
    assert g[1].dtype == jnp.float32   # db follows b_qkv


def test_token_filter_layer_out_of_range_raises():
    """jax.tree.map(lambda a: a[k]) silently clamps an out-of-range
    static index — the config check must make it loud instead."""
    import pytest

    cfg = ViTConfig(hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
                    mlp_ratio=2.0, patch_size=14, pretrain_img_size=28,
                    img_size=28, attn_impl="xla", token_filter_ratio=0.25,
                    token_filter_layer=6)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    pv = jnp.zeros((1, 28, 28, 3), jnp.float32)
    with pytest.raises(ValueError, match="token_filter_layer"):
        vit_forward(params, cfg, pv)


def test_token_filter_shapes_and_cls_kept():
    """Opt-in attention-aware token filtering: output grid shape is
    unchanged (dropped rows scattered back as zeros pre-final-LN), CLS
    is always kept, ratio=0 is bit-identical to the unfiltered path."""
    cfg0 = ViTConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                     mlp_ratio=2.0, patch_size=14, pretrain_img_size=28,
                     img_size=56, attn_impl="flash")
    cfg_f = dataclasses.replace(cfg0, token_filter_ratio=0.5, token_filter_layer=1)
    params = init_vit(jax.random.PRNGKey(0), cfg0)
    rng = np.random.default_rng(0)
    pv = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)

    ref = vit_forward(params, cfg0, pv)
    out = vit_forward(params, cfg_f, pv)
    assert out.shape == ref.shape  # (2, 1 + 16, 64)

    # ratio=0 goes through the unfiltered branch: identical
    out0 = vit_forward(params, dataclasses.replace(cfg0, token_filter_ratio=0.0), pv)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(ref))

    # CLS row is computed from the filtered sequence, not a zero row;
    # roughly half the patch rows collapse to the LN-of-zero constant
    final_b = params["final_ln"]["bias"]
    zero_row = np.asarray(
        jnp.zeros((64,)) * 0 + final_b
    )  # LN(0) = bias when scale*0/std == 0
    patch_rows = np.asarray(out[:, 1:])
    dropped = np.isclose(patch_rows, zero_row[None, None, :], atol=1e-6).all(-1)
    assert dropped.sum(axis=1).tolist() == [8, 8]  # 16 patches, ratio .5
    cls_rows = np.asarray(out[:, 0])
    assert not np.isclose(cls_rows, zero_row[None, :], atol=1e-6).all(-1).any()


def test_packed_vjp_layer_matches_xla_fwd_and_grads():
    """attn_impl='packed' (trainable transpose-free layout with the
    Pallas custom VJP, ops/fused_layer.py:flash_attention_packed_vjp)
    must match the xla layer in BOTH the forward and every parameter
    gradient — it is a training path, unlike 'fused'."""
    cfg_x = ViTConfig(hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
                      mlp_ratio=2.0, patch_size=14, pretrain_img_size=28,
                      img_size=28, attn_impl="xla")
    cfg_p = dataclasses.replace(cfg_x, attn_impl="packed")
    p = _layer_params(jax.random.PRNGKey(2), cfg_x)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 37, 64)), jnp.float32)

    # forward, including the self-padding branch for a non-lane-multiple L
    ref = dinov2_layer(x, p, cfg_x)
    out = dinov2_layer(x, p, cfg_p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # forward on a pre-padded sequence with real_len (the tower flow)
    x_pad = jnp.pad(x, ((0, 0), (0, 128 - 37), (0, 0)))
    outp = dinov2_layer(x_pad, p, cfg_p, real_len=37)[:, :37]
    np.testing.assert_allclose(np.asarray(outp), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # gradients: packed custom VJP vs xla autodiff, padded-rows flow
    def loss(params, cfg, xin, l=None):
        out = dinov2_layer(xin, params, cfg, real_len=l)
        if l is not None:
            out = out[:, :l]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss)(p, cfg_x, x)
    g_pack = jax.grad(loss)(p, cfg_p, x_pad, 37)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p = dict(jax.tree_util.tree_flatten_with_path(g_pack)[0])
    for path, val in flat_r:
        got = flat_p[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(val), rtol=2e-4, atol=2e-4,
            err_msg=str(path),
        )

    # input gradient too (flows into the previous layer in the tower)
    gx_ref = jax.grad(lambda xin: loss(p, cfg_x, xin))(x)
    gx_pack = jax.grad(lambda xin: loss(p, cfg_p, xin, 37))(x_pad)[:, :37]
    np.testing.assert_allclose(
        np.asarray(gx_pack), np.asarray(gx_ref), rtol=2e-4, atol=2e-4
    )


def test_fused_vjp_layer_matches_xla_fwd_and_grads():
    """attn_impl='fused_vjp' (trainable twin of the fused serving layer:
    same forward kernels, Pallas custom backwards for ln1+QKV and
    proj+res+ln2+MLP+res) must match the xla layer in the forward and
    every parameter gradient, including under remat."""
    cfg_x = ViTConfig(hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
                      mlp_ratio=2.0, patch_size=14, pretrain_img_size=28,
                      img_size=28, attn_impl="xla")
    cfg_f = dataclasses.replace(cfg_x, attn_impl="fused_vjp")
    p = _layer_params(jax.random.PRNGKey(3), cfg_x)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 37, 64)), jnp.float32)
    x_pad = jnp.pad(x, ((0, 0), (0, 128 - 37), (0, 0)))

    ref = dinov2_layer(x, p, cfg_x)
    # self-padding branch (no real_len) and tower flow (padded + real_len)
    out = dinov2_layer(x, p, cfg_f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    outp = dinov2_layer(x_pad, p, cfg_f, real_len=37)[:, :37]
    np.testing.assert_allclose(np.asarray(outp), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def loss(params, cfg, xin, l=None, remat=False):
        fn = dinov2_layer
        if remat:
            fn = jax.checkpoint(dinov2_layer, static_argnums=(2, 3))
        out = fn(xin, params, cfg, l)
        if l is not None:
            out = out[:, :l]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss)(p, cfg_x, x)
    for remat in (False, True):
        g_fus = jax.grad(loss)(p, cfg_f, x_pad, 37, remat)
        flat_f = dict(jax.tree_util.tree_flatten_with_path(g_fus)[0])
        for path, val in jax.tree_util.tree_flatten_with_path(g_ref)[0]:
            np.testing.assert_allclose(
                np.asarray(flat_f[path]), np.asarray(val), rtol=2e-4, atol=2e-4,
                err_msg=f"remat={remat} {path}",
            )

    gx_ref = jax.grad(lambda xin: loss(p, cfg_x, xin))(x)
    gx_fus = jax.grad(lambda xin: loss(p, cfg_f, xin, 37))(x_pad)[:, :37]
    np.testing.assert_allclose(
        np.asarray(gx_fus), np.asarray(gx_ref), rtol=2e-4, atol=2e-4
    )


def test_fused_mpnet_post_matches_unfused_fwd_and_grads():
    """TextConfig.fuse_post routes the o-proj+add+LN+MLP+add+LN chain
    through fused_mpnet_post_vjp; value and every gradient must match
    the unfused mpnet_layer, including under remat."""
    import dataclasses as dc

    from radzero_tpu.models.configuration import TextConfig
    from radzero_tpu.models.mpnet import init_mpnet, mpnet_forward

    cfg_u = TextConfig(hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       vocab_size=120, fuse_post=False)
    cfg_f = dc.replace(cfg_u, fuse_post=True)
    params = init_mpnet(jax.random.PRNGKey(4), cfg_u)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(3, 120, (4, 13)), jnp.int32)
    mask = jnp.asarray(
        np.stack([np.arange(13) < n for n in (13, 9, 5, 11)]), jnp.int32
    )

    def loss(p, cfg, remat=False):
        h = mpnet_forward(p, cfg, ids, mask, remat=remat)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    ref = mpnet_forward(params, cfg_u, ids, mask)
    out = mpnet_forward(params, cfg_f, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(loss)(params, cfg_u)
    for remat in (False, True):
        g_fus = jax.grad(loss)(params, cfg_f, remat)
        flat_f = dict(jax.tree_util.tree_flatten_with_path(g_fus)[0])
        for path, val in jax.tree_util.tree_flatten_with_path(g_ref)[0]:
            np.testing.assert_allclose(
                np.asarray(flat_f[path]), np.asarray(val), rtol=5e-4, atol=5e-4,
                err_msg=f"remat={remat} {path}",
            )

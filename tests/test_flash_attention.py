"""Flash-attention kernel parity (interpret mode on CPU) + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radzero_tpu.ops.flash_attention import flash_attention
from radzero_tpu.ops.layers import attention


def _qkv(rng, b=2, l=130, h=4, hd=32, dtype=np.float32):
    shape = (b, l, h, hd)
    return tuple(rng.standard_normal(shape).astype(dtype) for _ in range(3))


@pytest.mark.parametrize("l", [64, 130, 257])
def test_flash_matches_reference(l):
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, l=l)
    ref = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_flash_gradients_match_reference():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, b=1, l=70, h=2, hd=16)

    def loss_ref(q, k, v):
        return jnp.sum(attention(q, k, v) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*map(jnp.asarray, (q, k, v)))
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(*map(jnp.asarray, (q, k, v)))
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_vit_layer_flash_equals_xla():
    """The full layer path must be impl-invariant."""
    import dataclasses

    from radzero_tpu.models.configuration import ViTConfig
    from radzero_tpu.models.vit import dinov2_layer, init_vit_layers

    cfg = ViTConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2, mlp_ratio=2.0,
        attn_impl="flash",
    )
    layers = init_vit_layers(jax.random.PRNGKey(0), cfg)
    p0 = jax.tree.map(lambda a: a[0], layers)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 37, 32)), jnp.float32)

    out_flash = dinov2_layer(x, p0, cfg)
    out_xla = dinov2_layer(x, p0, dataclasses.replace(cfg, attn_impl="xla"))
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), rtol=1e-4, atol=1e-5
    )


def test_flash_gradients_multiblock_and_kvlen():
    """Backward accumulation across several q blocks (l=600 -> 5 blocks of
    128) and the persistent-padding path (kv_len < padded length)."""
    rng = np.random.default_rng(3)

    # multi-block accumulation
    q, k, v = _qkv(rng, b=1, l=600, h=1, hd=16)

    def loss_ref(q, k, v):
        return jnp.sum(attention(q, k, v) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*map(jnp.asarray, (q, k, v)))
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(*map(jnp.asarray, (q, k, v)))
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    # caller-padded sequence: only kv_len tokens are real
    q, k, v = _qkv(rng, b=1, l=128, h=2, hd=16)
    kv_len = 70

    def loss_flash_kv(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, None, kv_len)[:, :kv_len] ** 2)

    def loss_ref_kv(q, k, v):
        return jnp.sum(attention(q[:, :kv_len], k[:, :kv_len], v[:, :kv_len]) ** 2)

    gf = jax.grad(loss_flash_kv, argnums=(0, 1, 2))(*map(jnp.asarray, (q, k, v)))
    gr = jax.grad(loss_ref_kv, argnums=(0, 1, 2))(*map(jnp.asarray, (q, k, v)))
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(
            np.asarray(a)[:, :kv_len], np.asarray(b)[:, :kv_len], rtol=1e-4, atol=1e-4
        )


def test_flash_bias_matches_reference():
    """Bias-capable kernel vs eager attention: batch-shared (H, L, L)
    bias + per-row additive key mask (the MPNet layer contract)."""
    from radzero_tpu.ops.flash_attention import flash_attention_bias

    rng = np.random.default_rng(0)
    b, l, h, hd = 3, 37, 2, 16
    q = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, l, l)), jnp.float32)
    lengths = np.array([l, 20, 5])
    mask01 = (np.arange(l)[None, :] < lengths[:, None]).astype(np.float32)
    neg = jnp.asarray((1.0 - mask01) * np.finfo(np.float32).min)

    ref = attention(q, k, v, bias=bias[None] + neg[:, None, None, :],
                    scale=hd**-0.5)
    out = flash_attention_bias(q, k, v, bias, neg, hd**-0.5)
    # rows beyond each sample's real length are never consumed; compare
    # only real rows (eager rows there are well-defined, flash rows too,
    # both softmax over the same masked keys — compare everything)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_bias_gradients_match_reference():
    """dq/dk/dv/dbias parity incl. the batch-summed shared-bias gradient;
    d(neg_mask) must be zero."""
    from radzero_tpu.ops.flash_attention import flash_attention_bias

    rng = np.random.default_rng(1)
    b, l, h, hd = 2, 19, 2, 8
    q = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, l, l)), jnp.float32)
    lengths = np.array([l, 11])
    mask01 = (np.arange(l)[None, :] < lengths[:, None]).astype(np.float32)
    neg = jnp.asarray((1.0 - mask01) * np.finfo(np.float32).min)
    # cotangent only on real rows (padded query rows are never consumed)
    w = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    w = w * jnp.asarray(mask01)[:, :, None, None]

    def loss_ref(q, k, v, bias):
        o = attention(q, k, v, bias=bias[None] + neg[:, None, None, :],
                      scale=hd**-0.5)
        return jnp.sum(w * o)

    def loss_flash(q, k, v, bias):
        o = flash_attention_bias(q, k, v, bias, neg, hd**-0.5)
        return jnp.sum(w * o)

    ref_v, ref_g = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    out_v, out_g = jax.value_and_grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    np.testing.assert_allclose(out_v, ref_v, rtol=1e-5, atol=1e-5)
    for og, rg, name in zip(out_g, ref_g, ("dq", "dk", "dv", "dbias")):
        og, rg = np.asarray(og), np.asarray(rg)
        if name in ("dk", "dv"):
            # eager grads on masked-out KEY rows are zero too (prob 0);
            # compare everything
            pass
        np.testing.assert_allclose(og, rg, rtol=1e-4, atol=1e-5, err_msg=name)

    dneg = jax.grad(
        lambda n: jnp.sum(w * flash_attention_bias(q, k, v, bias, n, hd**-0.5))
    )(neg)
    np.testing.assert_array_equal(np.asarray(dneg), 0.0)


def test_flash_bias_gradients_long_sequence_fallback():
    """Past 1024 padded lanes the Pallas backward's single q-block no
    longer fits; the jnp fallback must keep long-text opt-in configs
    trainable with eager-parity gradients (TextConfig recommends
    attn_impl='flash' precisely for long sequences)."""
    from radzero_tpu.ops.flash_attention import flash_attention_bias

    rng = np.random.default_rng(2)
    b, l, h, hd = 1, 1056, 1, 8  # pads to 1152 > 1024
    q = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, l, l)) * 0.1, jnp.float32)
    mask01 = (np.arange(l)[None, :] < 1000).astype(np.float32)
    neg = jnp.asarray((1.0 - mask01) * np.finfo(np.float32).min)
    w = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    w = w * jnp.asarray(mask01)[:, :, None, None]

    def loss_ref(q, k, v, bias):
        o = attention(q, k, v, bias=bias[None] + neg[:, None, None, :],
                      scale=hd**-0.5)
        return jnp.sum(w * o)

    def loss_flash(q, k, v, bias):
        return jnp.sum(w * flash_attention_bias(q, k, v, bias, neg, hd**-0.5))

    ref_g = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    out_g = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for og, rg, name in zip(out_g, ref_g, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(og), np.asarray(rg), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_mpnet_flash_equals_xla():
    """Full MPNet tower: flash path == xla path, values and gradients."""
    import dataclasses

    from radzero_tpu.models.configuration import TextConfig
    from radzero_tpu.models.mpnet import init_mpnet, masked_mean_pool, mpnet_forward

    cfg_x = TextConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                       intermediate_size=64, vocab_size=101,
                       max_position_embeddings=40, attn_impl="xla")
    cfg_f = dataclasses.replace(cfg_x, attn_impl="flash")
    params = init_mpnet(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(2)
    ids = rng.integers(3, 101, (3, 12)).astype(np.int32)
    mask = np.ones((3, 12), np.int32)
    mask[1, 7:] = 0
    mask[2, 4:] = 0
    ids[mask == 0] = 1  # pad token
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    def pooled(p, cfg):
        h = mpnet_forward(p, cfg, ids, mask)
        return masked_mean_pool(h, mask)

    np.testing.assert_allclose(
        np.asarray(pooled(params, cfg_f)), np.asarray(pooled(params, cfg_x)),
        rtol=2e-5, atol=2e-5,
    )

    from jax.flatten_util import ravel_pytree

    g_f = jax.grad(lambda p: jnp.sum(pooled(p, cfg_f) ** 2))(params)
    g_x = jax.grad(lambda p: jnp.sum(pooled(p, cfg_x) ** 2))(params)
    flat_f, _ = ravel_pytree(g_f)
    flat_x, _ = ravel_pytree(g_x)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_x),
                               rtol=1e-4, atol=1e-5)

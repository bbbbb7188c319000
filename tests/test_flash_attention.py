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

"""Shared neural-net primitives (pure functions over param pytrees).

Numerics match the torch layers the reference composes:
- ``layer_norm``: torch.nn.LayerNorm (biased variance, eps inside sqrt)
- ``gelu``: exact erf GELU (HF ACT2FN['gelu'])
- ``attention``: eager softmax attention with fp32 softmax
  (HF ``eager_attention_forward``: softmax computed in float32 then cast
  back to the compute dtype)
- ``l2_normalize``: torch.nn.functional.normalize(p=2, eps=1e-12)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, params: dict, eps: float) -> jnp.ndarray:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def linear(x: jnp.ndarray, params: dict) -> jnp.ndarray:
    y = jnp.dot(x, params["kernel"].astype(x.dtype))
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(x.dtype)
    return y


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def normalize_pixels(x: jnp.ndarray, mean, std, dtype=jnp.float32) -> jnp.ndarray:
    """On-device rescale(1/255) + per-channel mean/std normalisation for
    uint8-uploaded images (NHWC). Exactly the host `_normalize`
    (data/processing.py) arithmetic — the serving/eval fast path uploads
    resized u8 (4x fewer bytes over PCIe/tunnel) and XLA fuses this into
    the patch-embed convolution. Float inputs pass through unchanged
    (already normalised on host)."""
    if x.dtype != jnp.uint8:
        return x.astype(dtype)
    scale = (1.0 / (255.0 * jnp.asarray(std, jnp.float32))).astype(dtype)
    bias = (-jnp.asarray(mean, jnp.float32) / jnp.asarray(std, jnp.float32)).astype(dtype)
    return x.astype(dtype) * scale + bias


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # torch F.normalize: x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, l, h, hd = x.shape
    return x.reshape(b, l, h * hd)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Eager attention over (B, L, H, hd) tensors; returns (B, L, H, hd).

    ``bias`` broadcasts against scores of shape (B, H, Lq, Lk) and is added
    *after* scaling (MPNet adds relative-position bias + attention mask there).
    Softmax runs in float32 (HF eager_attention_forward semantics).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

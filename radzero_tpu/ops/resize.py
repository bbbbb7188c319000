"""Torch-parity separable image resizing as matmuls.

The reference relies on ``torch.nn.functional.interpolate`` with
``align_corners=False`` in two numerically sensitive places:

- bicubic interpolation of ViT position embeddings to the high-res
  patch grid (HF ``Dinov2Embeddings.interpolate_pos_encoding``; also
  exp/cxr_pt/model/vision_encoders.py:98-125), and
- bilinear upsampling of 37x37 similarity maps to the original image
  resolution (exp/cxr_pt/inference/segmentation_utils.py:36-122,
  grounding_utils.py:166-261).

On TPU the natural formulation is *separable resize as two matmuls*:
``out = W_h @ img @ W_w^T`` where the 1-D interpolation weight matrices
``W`` are computed on host (numpy, fp64 accumulated, cast to fp32) and
folded into the jitted graph as constants. This runs on the MXU, is
exactly linear, and reproduces torch's kernel taps bit-for-bit up to
fp32 rounding:

- source coordinate: ``src = (dst + 0.5) * (in/out) - 0.5``
- bilinear taps: floor/floor+1 with (1-t, t), indices clamped
- bicubic taps: 4-tap cubic convolution with A = -0.75 (Keys kernel,
  torch's ``cubic_convolution1/2``), indices clamped to the border
  (weights of out-of-range taps accumulate onto the clamped index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_A = -0.75  # torch's bicubic coefficient


def _cubic_w(t: np.ndarray) -> np.ndarray:
    """Weights for taps at offsets (-1, 0, 1, 2) from floor(src), t = frac(src)."""
    # torch aten/src/ATen/native/UpSample.h: cubic_convolution1/2 with A=-0.75
    def conv1(x):  # |x| <= 1
        return ((_A + 2) * x - (_A + 3)) * x * x + 1

    def conv2(x):  # 1 < |x| < 2
        return ((_A * x - 5 * _A) * x + 8 * _A) * x - 4 * _A

    return np.stack([conv2(t + 1.0), conv1(t), conv1(1.0 - t), conv2(2.0 - t)], axis=-1)


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, mode: str = "bilinear") -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix matching torch semantics."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)

    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5

    W = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bilinear":
        # torch clamps src to >= 0 before splitting into (idx, frac)
        src_c = np.clip(src, 0.0, None)
        idx0 = np.floor(src_c).astype(np.int64)
        idx0 = np.minimum(idx0, in_size - 1)
        idx1 = np.minimum(idx0 + 1, in_size - 1)
        t = src_c - idx0
        for o in range(out_size):
            W[o, idx0[o]] += 1.0 - t[o]
            W[o, idx1[o]] += t[o]
    elif mode == "bicubic":
        idxf = np.floor(src).astype(np.int64)
        t = src - idxf
        w = _cubic_w(t)  # (out, 4)
        for o in range(out_size):
            for k in range(4):
                i = int(np.clip(idxf[o] - 1 + k, 0, in_size - 1))
                W[o, i] += w[o, k]
    else:
        raise ValueError(f"unknown resize mode: {mode}")
    return W.astype(np.float32)


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """Apply (out_h,in_h) and (out_w,in_w) matrices over the last two axes of x."""
    wh = jnp.asarray(wh, dtype=x.dtype)
    ww = jnp.asarray(ww, dtype=x.dtype)
    # HIGHEST precision: interpolation weights must not round to bf16 on the MXU
    x = jnp.einsum("...hw,oh->...ow", x, wh, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("...hw,pw->...hp", x, ww, precision=jax.lax.Precision.HIGHEST)
    return x


def bilinear_resize_2d(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=False) over the last two axes."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    return _apply_separable(x, resize_matrix(in_h, out_h, "bilinear"), resize_matrix(in_w, out_w, "bilinear"))


def bicubic_resize_2d(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """F.interpolate(mode='bicubic', align_corners=False) over the last two axes."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    return _apply_separable(x, resize_matrix(in_h, out_h, "bicubic"), resize_matrix(in_w, out_w, "bicubic"))

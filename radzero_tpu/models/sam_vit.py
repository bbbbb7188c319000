"""SAM (Segment Anything) ViT-det vision encoder, TPU-native.

The reference ACCEPTS ``model_type: "sam"`` in its config/processing
plumbing (exp/cxr_pt/model/configuration.py:22, processing.py:29) but
its encoder factory has no branch for it, so a "sam" config crashes
with NotImplementedError (exp/cxr_pt/model/vision_encoders.py:23-43).
This module implements the tower for real: a functional ViT-det trunk
with HF ``SamVisionEncoder`` semantics (modeling_sam.py) so true SAM
checkpoints convert and run.

Architecture (per HF SamVisionEncoder):
- patch-16 conv embedding kept as 2-D feature map (B, H, W, D) — here
  as reshape + one MXU matmul (vit.patchify);
- learned ABSOLUTE position embedding at the pretrain grid (no CLS
  token anywhere in the trunk);
- pre-LN blocks with windowed attention (window ``window_size``, zero
  padding at the grid edge) except at ``global_attn_indexes``, which
  attend over the full grid;
- decomposed RELATIVE position bias (MViTv2 style): per-layer learned
  tables rel_pos_h/rel_pos_w indexed by axial offset, added to the
  scores as rel_h[:, :, :, None] + rel_w[:, :, None, :];
- a convolutional "neck" (1x1 -> LN -> 3x3 -> LN, both convs bias-free)
  projecting to ``output_channels``.

TPU-first choices: NHWC end to end (the HF neck permutes to NCHW for
Conv2d; math identical), window partition as static reshape/transpose
(all shapes compile-time constants), packed qkv as a single matmul, a
Python loop over the 12 layers (window size and rel-pos table shapes
vary per layer, so a uniform ``lax.scan`` stack does not apply), fp32
softmax.

Composite-model integration (our design — the reference has none, it
crashes): :func:`sam_vit_forward` returns (B, 1 + H*W, D) tokens where
slot 0 is the mean-pooled trunk feature standing in for the CLS token
the align stage expects, and patch tokens are the PRE-neck trunk map
(hidden_size-dim, matching the align transformer width). The neck is
exposed separately (:func:`sam_neck`) for feature-pyramid consumers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.models.vit import patchify
from radzero_tpu.ops.layers import gelu, layer_norm, linear


@dataclass(frozen=True)
class SamViTConfig:
    """HF ``SamVisionConfig`` subset (facebook/sam-vit-base defaults)."""

    model_type: str = "sam"
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    num_channels: int = 3
    image_size: int = 1024          # pretrain grid the abs-pos embeds store
    img_size: int = 1024            # runtime resolution (must divide patch)
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    use_abs_pos: bool = True
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-6
    output_channels: int = 256

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def pos_grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def patch_grid(self) -> int:
        return self.img_size // self.patch_size

    def layer_window(self, i: int) -> int:
        """Window size for layer i (0 = global attention), as HF builds
        its layers (SamVisionEncoder.__init__)."""
        return 0 if i in self.global_attn_indexes else self.window_size

    def layer_input_size(self, i: int) -> int:
        """Grid edge the layer's rel-pos tables are stored for."""
        w = self.layer_window(i)
        return self.pos_grid if w == 0 else w


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, std=0.02, bias=True):
    p = {"kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_sam_vit(key, cfg: SamViTConfig) -> dict:
    d, hd = cfg.hidden_size, cfg.head_dim
    kp, kpos, kl, kn = jax.random.split(key, 4)
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.num_channels
    params: dict = {
        "patch_embed": _init_linear(kp, patch_dim, d),
    }
    if cfg.use_abs_pos:
        g = cfg.pos_grid
        params["pos_embed"] = jnp.zeros((1, g, g, d), jnp.float32)

    layers = []
    for i, k in enumerate(jax.random.split(kl, cfg.num_hidden_layers)):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        layer = {
            "ln1": _init_ln(d),
            "qkv": _init_linear(k1, d, 3 * d, bias=cfg.qkv_bias),
            "proj": _init_linear(k2, d, d),
            "ln2": _init_ln(d),
            "mlp": {
                "fc1": _init_linear(k3, d, cfg.mlp_dim),
                "fc2": _init_linear(k4, cfg.mlp_dim, d),
            },
        }
        if cfg.use_rel_pos:
            edge = cfg.layer_input_size(i)
            layer["rel_pos_h"] = jnp.zeros((2 * edge - 1, hd), jnp.float32)
            layer["rel_pos_w"] = jnp.zeros((2 * edge - 1, hd), jnp.float32)
        layers.append(layer)
    params["layers"] = layers

    kn1, kn2 = jax.random.split(kn)
    params["neck"] = {
        # conv1: 1x1, stored as a (D, out) matmul kernel; conv2: 3x3 HWIO
        "conv1": jax.random.normal(kn1, (d, cfg.output_channels), jnp.float32) * 0.02,
        "ln1": _init_ln(cfg.output_channels),
        "conv2": jax.random.normal(
            kn2, (3, 3, cfg.output_channels, cfg.output_channels), jnp.float32
        ) * 0.02,
        "ln2": _init_ln(cfg.output_channels),
    }
    return params


# ---------------------------------------------------------------------------
# Relative position bias
# ---------------------------------------------------------------------------

def _rel_pos_table(rel_pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """(L, hd) stored table -> (size, size) axial offset table (q, k, hd).

    HF ``SamVisionAttention.get_rel_pos`` with q_size == k_size:
    linearly resample the stored table to length 2*size-1 when it
    differs (F.interpolate mode='linear', align_corners=False), then
    index with offset (q - k) + size - 1.
    """
    need = 2 * size - 1
    if rel_pos.shape[0] != need:
        from radzero_tpu.ops.resize import resize_matrix

        m = jnp.asarray(resize_matrix(rel_pos.shape[0], need, "bilinear"))
        rel_pos = jnp.einsum(
            "Ol,lc->Oc", m, rel_pos.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(rel_pos.dtype)
    q = np.arange(size)[:, None]
    k = np.arange(size)[None, :]
    idx = jnp.asarray(q - k + size - 1)
    return rel_pos[idx]  # (size, size, hd)


def _decomposed_rel_bias(
    q: jnp.ndarray, rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray, h: int, w: int
) -> jnp.ndarray:
    """Scores bias (Bn, heads, h*w, h*w) from axial tables.

    ``q`` is (Bn, heads, h*w, hd). Matches HF get_decomposed_rel_pos:
    rel_h[:, :, :, None] + rel_w[:, :, None, :] over (qh, qw, kh, kw).
    """
    bn, heads, _, hd = q.shape
    rh = _rel_pos_table(rel_pos_h, h).astype(q.dtype)  # (h, h, hd)
    rw = _rel_pos_table(rel_pos_w, w).astype(q.dtype)  # (w, w, hd)
    qg = q.reshape(bn, heads, h, w, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", qg, rh)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", qg, rw)
    bias = rel_h[..., :, None] + rel_w[..., None, :]   # (bn, heads, h, w, kh, kw)
    return bias.reshape(bn, heads, h * w, h * w)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _window_partition(x: jnp.ndarray, win: int):
    """(B, H, W, D) -> (B*nW, win, win, D) with zero edge padding."""
    b, h, w, d = x.shape
    ph, pw = -h % win, -w % win
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = h + ph, w + pw
    x = x.reshape(b, hh // win, win, ww // win, win, d)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win, win, d), (hh, ww)


def _window_unpartition(x: jnp.ndarray, win: int, padded_hw, orig_hw):
    hh, ww = padded_hw
    h, w = orig_hw
    b = x.shape[0] // (hh // win * (ww // win))
    x = x.reshape(b, hh // win, ww // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, -1)
    return x[:, :h, :w]


def _sam_attention(x: jnp.ndarray, p: dict, cfg: SamViTConfig) -> jnp.ndarray:
    """Attention over a (Bn, h, w, D) feature map (window or full grid)."""
    bn, h, w, d = x.shape
    heads, hd = cfg.num_attention_heads, cfg.head_dim
    qkv = linear(x.reshape(bn, h * w, d), p["qkv"])  # (Bn, hw, 3D)
    qkv = qkv.reshape(bn, h * w, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                  # (Bn, heads, hw, hd)
    scores = jnp.einsum("bnqc,bnkc->bnqk", q, k) * (hd**-0.5)
    if cfg.use_rel_pos:
        scores = scores + _decomposed_rel_bias(q, p["rel_pos_h"], p["rel_pos_w"], h, w)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bnqk,bnkc->bnqc", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(bn, h, w, d)
    return linear(out, p["proj"])


def sam_layer(x: jnp.ndarray, p: dict, cfg: SamViTConfig, window: int) -> jnp.ndarray:
    """One ViT-det block on the (B, H, W, D) map (HF SamVisionLayer)."""
    residual = x
    h = layer_norm(x, p["ln1"], cfg.layer_norm_eps)
    if window > 0:
        orig_hw = h.shape[1], h.shape[2]
        h, padded_hw = _window_partition(h, window)
        h = _sam_attention(h, p, cfg)
        h = _window_unpartition(h, window, padded_hw, orig_hw)
    else:
        h = _sam_attention(h, p, cfg)
    x = residual + h
    m = layer_norm(x, p["ln2"], cfg.layer_norm_eps)
    m = linear(gelu(linear(m, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    return x + m


def _interpolate_abs_pos(pos: jnp.ndarray, grid_hw) -> jnp.ndarray:
    """(1, G, G, D) -> (1, h, w, D). HF SAM has no runtime resizing (it
    errors on mismatched input size); this bicubic resample is our
    extension so the tower runs at RadZero resolutions (518 etc.) —
    same recipe as vit.interpolate_pos_embed."""
    h, w = grid_hw
    g = pos.shape[1]
    if (h, w) == (g, g):
        return pos
    from radzero_tpu.ops.resize import resize_matrix

    p32 = pos.astype(jnp.float32)
    wh = jnp.asarray(resize_matrix(g, h, "bicubic"))
    ww = jnp.asarray(resize_matrix(g, w, "bicubic"))
    p32 = jnp.einsum("bghd,Hg->bHhd", p32, wh, precision=jax.lax.Precision.HIGHEST)
    p32 = jnp.einsum("bHgd,Wg->bHWd", p32, ww, precision=jax.lax.Precision.HIGHEST)
    return p32.astype(pos.dtype)


def sam_trunk(
    params: dict, cfg: SamViTConfig, pixel_values: jnp.ndarray, *, dtype=jnp.float32
) -> jnp.ndarray:
    """Patch embed + abs pos + all blocks -> (B, h, w, D) feature map
    (HF SamVisionEncoder up to, excluding, the neck)."""
    b, hh, ww, _ = pixel_values.shape
    h, w = hh // cfg.patch_size, ww // cfg.patch_size
    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = linear(x, params["patch_embed"]).reshape(b, h, w, cfg.hidden_size)
    if cfg.use_abs_pos:
        x = x + _interpolate_abs_pos(params["pos_embed"], (h, w)).astype(dtype)
    for i, p in enumerate(params["layers"]):
        x = sam_layer(x, p, cfg, cfg.layer_window(i))
    return x


def sam_neck(params: dict, cfg: SamViTConfig, fmap: jnp.ndarray) -> jnp.ndarray:
    """Convolutional neck: (B, h, w, D) -> (B, h, w, output_channels).

    HF runs NCHW Conv2d + channels-first LN; NHWC here — the 1x1 conv
    is one matmul and both LayerNorms normalise the trailing channel
    axis directly (identical math, no layout transposes on TPU)."""
    p = params["neck"]
    x = fmap @ p["conv1"].astype(fmap.dtype)
    x = layer_norm(x, p["ln1"], 1e-6)
    x = jax.lax.conv_general_dilated(
        x, p["conv2"].astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return layer_norm(x, p["ln2"], 1e-6)


def sam_vit_forward(
    params: dict, cfg: SamViTConfig, pixel_values: jnp.ndarray, *, dtype=jnp.float32,
    **_unused,
) -> jnp.ndarray:
    """Composite-model entry: (B, H, W, C) -> (B, 1 + h*w, D) tokens.

    Slot 0 is the mean-pooled trunk feature (SAM has no CLS token; the
    align stage and RadZeroLoss expect a pooled prefix slot — same
    convention the m3ae tower uses for its global latent)."""
    fmap = sam_trunk(params, cfg, pixel_values, dtype=dtype)
    b, h, w, d = fmap.shape
    tokens = fmap.reshape(b, h * w, d)
    pooled = jnp.mean(tokens, axis=1, keepdims=True)
    return jnp.concatenate([pooled, tokens], axis=1)

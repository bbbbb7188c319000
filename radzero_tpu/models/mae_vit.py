"""MAE-style ViT vision encoder ("m3ae" / MRM-equivalent).

The reference's optional 'm3ae' vision tower is CARZero's MRM — a
masked-autoencoder ViT whose encoder returns a (global, local) latent
pair consumed as vision tokens (exp/cxr_pt/model/vision_encoders.py:
47-64; modeling.py:100-106). This is a clean-room MAE encoder with the
standard recipe: patch-16 embedding, CLS token, *fixed 2-D sin-cos*
position embeddings, pre-LN blocks without LayerScale, final LayerNorm;
global latent = normalised CLS, local latents = patch tokens.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.ops.layers import (
    attention,
    gelu,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)
from radzero_tpu.models.vit import patchify


@dataclass(frozen=True)
class MAEViTConfig:
    model_type: str = "mae"
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    img_size: int = 224

    @property
    def intermediate_size(self):
        return int(self.hidden_size * self.mlp_ratio)


def sincos_pos_embed_2d(dim: int, grid_h: int, grid_w: int, cls_token: bool = True) -> np.ndarray:
    """Standard MAE fixed 2-D sin-cos position embedding (1, [1+]h*w, D)."""
    def one_dim(d, pos):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=np.float64) / (d / 2))
        out = np.einsum("p,f->pf", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_h, dtype=np.float64)
    gw = np.arange(grid_w, dtype=np.float64)
    ww, hh = np.meshgrid(gw, gh)
    emb = np.concatenate([one_dim(dim // 2, hh), one_dim(dim // 2, ww)], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, dim)), emb], axis=0)
    return emb[None].astype(np.float32)


def _init_linear(key, d_in, d_out, std=0.02):
    return {
        "kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_mae_vit(key, cfg: MAEViTConfig) -> dict:
    d, f = cfg.hidden_size, cfg.intermediate_size
    kp, kc, kl = jax.random.split(key, 3)

    def one(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": _init_ln(d),
            "attn": {
                "q": _init_linear(ks[0], d, d),
                "k": _init_linear(ks[1], d, d),
                "v": _init_linear(ks[2], d, d),
                "o": _init_linear(ks[3], d, d),
            },
            "ln2": _init_ln(d),
            "mlp": {"fc1": _init_linear(ks[4], d, f), "fc2": _init_linear(ks[5], f, d)},
        }

    return {
        "patch_embed": _init_linear(kp, cfg.patch_size**2 * cfg.num_channels, d),
        "cls_token": jax.random.normal(kc, (1, 1, d), jnp.float32) * 0.02,
        "layers": jax.vmap(one)(jax.random.split(kl, cfg.num_hidden_layers)),
        "final_ln": _init_ln(d),
    }


def _mae_layer(x, p, cfg):
    h = layer_norm(x, p["ln1"], cfg.layer_norm_eps)
    q = split_heads(linear(h, p["attn"]["q"]), cfg.num_attention_heads)
    k = split_heads(linear(h, p["attn"]["k"]), cfg.num_attention_heads)
    v = split_heads(linear(h, p["attn"]["v"]), cfg.num_attention_heads)
    x = x + linear(merge_heads(attention(q, k, v)), p["attn"]["o"])
    h = layer_norm(x, p["ln2"], cfg.layer_norm_eps)
    return x + linear(gelu(linear(h, p["mlp"]["fc1"])), p["mlp"]["fc2"])


def mae_vit_forward(
    params: dict, cfg: MAEViTConfig, pixel_values: jnp.ndarray, *, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (global (B, D), local (B, h*w, D)) — the MRM output contract."""
    b, hh, ww, _ = pixel_values.shape
    gh, gw = hh // cfg.patch_size, ww // cfg.patch_size
    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = linear(x, params["patch_embed"])
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + jnp.asarray(sincos_pos_embed_2d(cfg.hidden_size, gh, gw), dtype)

    def body(h, p):
        return _mae_layer(h, p, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["final_ln"], cfg.layer_norm_eps)
    return x[:, 0], x[:, 1:]


def mae_vision_tokens(params, cfg, pixel_values, *, dtype=jnp.float32) -> jnp.ndarray:
    """Vision-token layout the composite model consumes: concat of the
    global latent and patch latents (ref modeling.py:100-106)."""
    g, l = mae_vit_forward(params, cfg, pixel_values, dtype=dtype)
    return jnp.concatenate([g[:, None], l], axis=1)

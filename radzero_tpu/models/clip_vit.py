"""CLIP / SigLIP-style vision towers.

Alternate vision encoders from the reference factory
(exp/cxr_pt/model/vision_encoders.py:23-43: clip_vision_model,
siglip_vision_model, xrayclip, biomedclip). Architecture facts (HF
CLIPVisionTransformer / SiglipVisionTransformer):

- CLIP: class embedding + bias-free patch conv, learned absolute pos
  embeds (incl. CLS slot), pre-layernorm, pre-LN encoder blocks with
  quick_gelu, last_hidden_state = encoder output (post_layernorm only
  feeds pooling). XrayCLIP and BioMedCLIP are CLIP-shaped.
- SigLIP: no class token, gelu_tanh ("gelu_pytorch_tanh"), trailing
  post_layernorm applied to the hidden states.

High-resolution inference resamples the position embeddings bicubically
(the wrapper behavior of vision_encoders.py:98-125,164-191), reusing
the same fp32 matmul resize as the DINOv2 tower.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from radzero_tpu.ops.layers import (
    attention,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)
from radzero_tpu.models.vit import interpolate_pos_embed, patchify


@dataclass(frozen=True)
class ClipViTConfig:
    model_type: str = "clip"          # clip | siglip
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    pretrain_img_size: int = 224
    img_size: int = 518
    hidden_act: str = "quick_gelu"    # quick_gelu | gelu_pytorch_tanh
    use_class_token: bool = True      # False for SigLIP
    final_layernorm: bool = False     # True for SigLIP

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


def _act(x, name: str):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu_pytorch_tanh", "gelu_tanh"):
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _init_linear(key, d_in, d_out, std=0.02):
    return {
        "kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_clip_vit(key, cfg: ClipViTConfig) -> dict:
    d, f = cfg.hidden_size, cfg.intermediate_size
    grid = cfg.pretrain_img_size // cfg.patch_size
    n_pos = grid * grid + (1 if cfg.use_class_token else 0)
    keys = jax.random.split(key, 4)

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

    params = {
        "patch_embed": {
            "kernel": jax.random.normal(
                keys[0], (cfg.patch_size * cfg.patch_size * cfg.num_channels, d), jnp.float32
            )
            * 0.02
        },
        "pos_embed": jax.random.normal(keys[1], (1, n_pos, d), jnp.float32) * 0.02,
        "pre_ln": _init_ln(d),
        "layers": jax.vmap(one)(jax.random.split(keys[2], cfg.num_hidden_layers)),
    }
    if cfg.use_class_token:
        params["class_embedding"] = jax.random.normal(keys[3], (d,), jnp.float32) * 0.02
    if cfg.final_layernorm:
        params["post_ln"] = _init_ln(d)
    return params


def _clip_layer(x, p, cfg: ClipViTConfig):
    h = layer_norm(x, p["ln1"], cfg.layer_norm_eps)
    q = split_heads(linear(h, p["attn"]["q"]), cfg.num_attention_heads)
    k = split_heads(linear(h, p["attn"]["k"]), cfg.num_attention_heads)
    v = split_heads(linear(h, p["attn"]["v"]), cfg.num_attention_heads)
    a = linear(merge_heads(attention(q, k, v)), p["attn"]["o"])
    x = x + a
    h = layer_norm(x, p["ln2"], cfg.layer_norm_eps)
    m = linear(_act(linear(h, p["mlp"]["fc1"]), cfg.hidden_act), p["mlp"]["fc2"])
    return x + m


def clip_vit_forward(
    params: dict, cfg: ClipViTConfig, pixel_values: jnp.ndarray, *, dtype=jnp.float32
) -> jnp.ndarray:
    """(B, H, W, C) NHWC -> (B, [1+]h*w, D) last hidden state."""
    b, hh, ww, _ = pixel_values.shape
    grid = (hh // cfg.patch_size, ww // cfg.patch_size)
    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = jnp.dot(x, params["patch_embed"]["kernel"].astype(dtype))
    if "bias" in params["patch_embed"]:  # timm ViTs carry a patch bias
        x = x + params["patch_embed"]["bias"].astype(dtype)
    if cfg.use_class_token:
        cls = jnp.broadcast_to(
            params["class_embedding"].astype(dtype)[None, None], (b, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls, x], axis=1)
        pos = interpolate_pos_embed(params["pos_embed"], grid)
    else:
        # SigLIP pos embeds have no CLS slot: interpolate the full table
        pe = params["pos_embed"]
        fake = jnp.concatenate([jnp.zeros_like(pe[:, :1]), pe], axis=1)
        pos = interpolate_pos_embed(fake, grid)[:, 1:]
    x = x + pos.astype(dtype)
    x = layer_norm(x, params["pre_ln"], cfg.layer_norm_eps) if "pre_ln" in params else x

    def body(h, layer_params):
        return _clip_layer(h, layer_params, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    if cfg.final_layernorm and "post_ln" in params:
        x = layer_norm(x, params["post_ln"], cfg.layer_norm_eps)
    return x


# ---------------------------------------------------------------------------
# Converters (HF CLIPVisionModel / SiglipVisionModel state dicts)
# ---------------------------------------------------------------------------

def convert_clip_vision(sd: dict, num_layers: int, prefix: str = "vision_model.") -> dict:
    import numpy as np

    def lin(name):
        return {"kernel": sd[f"{name}.weight"].T.copy(), "bias": sd[f"{name}.bias"].copy()}

    def ln(name):
        return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}

    p = prefix
    w = sd[f"{p}embeddings.patch_embedding.weight"]  # (D, C, P, P), no bias in CLIP
    d = w.shape[0]
    layers = []
    for i in range(num_layers):
        q = f"{p}encoder.layers.{i}"
        layers.append(
            {
                "ln1": ln(f"{q}.layer_norm1"),
                "attn": {
                    "q": lin(f"{q}.self_attn.q_proj"),
                    "k": lin(f"{q}.self_attn.k_proj"),
                    "v": lin(f"{q}.self_attn.v_proj"),
                    "o": lin(f"{q}.self_attn.out_proj"),
                },
                "ln2": ln(f"{q}.layer_norm2"),
                "mlp": {"fc1": lin(f"{q}.mlp.fc1"), "fc2": lin(f"{q}.mlp.fc2")},
            }
        )

    def stack(ds):
        out = {}
        for k, v in ds[0].items():
            out[k] = stack([x[k] for x in ds]) if isinstance(v, dict) else np.stack([x[k] for x in ds])
        return out

    params = {
        "patch_embed": {"kernel": w.transpose(2, 3, 1, 0).reshape(-1, d).copy()},
        "pos_embed": sd[f"{p}embeddings.position_embedding.weight"][None].copy(),
        "pre_ln": ln(f"{p}pre_layrnorm")
        if f"{p}pre_layrnorm.weight" in sd
        else ln(f"{p}pre_layernorm"),
        "layers": stack(layers),
    }
    if f"{p}embeddings.class_embedding" in sd:
        params["class_embedding"] = sd[f"{p}embeddings.class_embedding"].copy()
    if f"{p}post_layernorm.weight" in sd:
        params["post_ln"] = ln(f"{p}post_layernorm")
    return params


def convert_timm_vit(sd: dict, num_layers: int, prefix: str = "") -> dict:
    """timm VisionTransformer state dict -> params pytree.

    The layout BioMedCLIP's open_clip tower uses
    (ref vision_encoders.py biomedclip wrapper): patch conv WITH bias,
    no pre-layernorm, fused blocks.{i}.attn.qkv, trailing 'norm'.
    Pair with ClipViTConfig(hidden_act='gelu', final_layernorm=True).
    """
    import numpy as np

    p = prefix

    def lin(name):
        return {"kernel": sd[f"{name}.weight"].T.copy(), "bias": sd[f"{name}.bias"].copy()}

    def ln(name):
        return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}

    w = sd[f"{p}patch_embed.proj.weight"]  # (D, C, P, P)
    d = w.shape[0]

    layers = []
    for i in range(num_layers):
        q = f"{p}blocks.{i}"
        qkv_w = sd[f"{q}.attn.qkv.weight"]  # (3D, D)
        qkv_b = sd[f"{q}.attn.qkv.bias"]
        wq, wk, wv = np.split(qkv_w, 3, axis=0)
        bq, bk, bv = np.split(qkv_b, 3, axis=0)
        layers.append(
            {
                "ln1": ln(f"{q}.norm1"),
                "attn": {
                    "q": {"kernel": wq.T.copy(), "bias": bq.copy()},
                    "k": {"kernel": wk.T.copy(), "bias": bk.copy()},
                    "v": {"kernel": wv.T.copy(), "bias": bv.copy()},
                    "o": lin(f"{q}.attn.proj"),
                },
                "ln2": ln(f"{q}.norm2"),
                "mlp": {"fc1": lin(f"{q}.mlp.fc1"), "fc2": lin(f"{q}.mlp.fc2")},
            }
        )

    def stack(ds):
        out = {}
        for k, v in ds[0].items():
            out[k] = stack([x[k] for x in ds]) if isinstance(v, dict) else np.stack([x[k] for x in ds])
        return out

    return {
        "patch_embed": {
            "kernel": w.transpose(2, 3, 1, 0).reshape(-1, d).copy(),
            "bias": sd[f"{p}patch_embed.proj.bias"].copy(),
        },
        "class_embedding": sd[f"{p}cls_token"].reshape(-1).copy(),
        "pos_embed": sd[f"{p}pos_embed"].copy(),
        "layers": stack(layers),
        "post_ln": ln(f"{p}norm"),
    }

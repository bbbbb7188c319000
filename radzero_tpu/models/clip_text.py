"""CLIP text tower (clip_text / siglip_text factory entries,
ref exp/cxr_pt/model/text_encoders.py:8-28).

HF CLIPTextTransformer semantics: token + absolute position embeddings,
pre-LN blocks with quick_gelu and a *causal* mask combined with the
padding mask, final LayerNorm; pooled feature = hidden state at the
EOS (argmax of input_ids == eos_token_id) position.
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


@dataclass(frozen=True)
class ClipTextConfig:
    model_type: str = "clip_text"
    hidden_size: int = 512
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    vocab_size: int = 49408
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _init_linear(key, d_in, d_out, std=0.02):
    return {
        "kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_clip_text(key, cfg: ClipTextConfig) -> dict:
    d, f = cfg.hidden_size, cfg.intermediate_size
    kw, kp, kl = jax.random.split(key, 3)

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
        "embeddings": {
            "word": jax.random.normal(kw, (cfg.vocab_size, d), jnp.float32) * 0.02,
            "position": jax.random.normal(kp, (cfg.max_position_embeddings, d), jnp.float32) * 0.02,
        },
        "layers": jax.vmap(one)(jax.random.split(kl, cfg.num_hidden_layers)),
        "final_ln": _init_ln(d),
    }


def clip_text_forward(
    params: dict,
    cfg: ClipTextConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    dtype=jnp.float32,
):
    """-> (last_hidden (S, L, D), pooled EOS features (S, D))."""
    s, l = input_ids.shape
    emb = params["embeddings"]
    x = jnp.take(emb["word"], input_ids, axis=0) + emb["position"][None, :l]
    x = x.astype(dtype)

    neg = jnp.finfo(jnp.float32).min
    causal = jnp.triu(jnp.full((l, l), neg, jnp.float32), k=1)[None, None]
    pad = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * neg
    bias = (causal + pad).astype(dtype)

    def body(h, p):
        a = layer_norm(h, p["ln1"], cfg.layer_norm_eps)
        q = split_heads(linear(a, p["attn"]["q"]), cfg.num_attention_heads)
        k = split_heads(linear(a, p["attn"]["k"]), cfg.num_attention_heads)
        v = split_heads(linear(a, p["attn"]["v"]), cfg.num_attention_heads)
        h = h + linear(merge_heads(attention(q, k, v, bias=bias)), p["attn"]["o"])
        m = layer_norm(h, p["ln2"], cfg.layer_norm_eps)
        h = h + linear(_quick_gelu(linear(m, p["mlp"]["fc1"])), p["mlp"]["fc2"])
        return h, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["final_ln"], cfg.layer_norm_eps)

    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
    pooled = x[jnp.arange(s), eos_pos]
    return x, pooled

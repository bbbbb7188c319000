"""MPNet text encoder (all-mpnet-base-v2), TPU-native.

Functional re-design of the sentence-embedding tower the reference uses
via HF ``MPNetModel`` (exp/cxr_pt/model/text_encoders.py:8-28,
modeling.py:128-156). Architecture facts reproduced exactly:

- learned absolute position embeddings with RoBERTa-style position ids:
  ``cumsum(ids != pad) * (ids != pad) + pad`` with pad_token_id = 1;
- a single relative-attention-bias embedding shared by all layers
  (T5-style bidirectional buckets, num_buckets=32, max_distance=128),
  added to the attention scores of every layer;
- post-LayerNorm blocks: LN(x + attn(x)), LN(y + ffn(y)), eps 1e-12;
- additive attention mask of ``finfo(dtype).min`` on padded keys.

TPU-first choices: layers stacked + ``lax.scan``; the relative-position
bucket table is a static numpy computation folded at trace time (it
depends only on the static sequence length); fp32 softmax.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from radzero_tpu.models.configuration import TextConfig
from radzero_tpu.ops.layers import (
    attention,
    gelu,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)


# ---------------------------------------------------------------------------
# Relative position buckets (static, numpy)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def relative_position_bucket_table(
    seq_len: int, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """(L, L) int32 bucket ids; mirrors MPNetEncoder.relative_position_bucket."""
    context = np.arange(seq_len)[:, None]
    memory = np.arange(seq_len)[None, :]
    relative_position = memory - context
    n = -relative_position

    nb = num_buckets // 2
    ret = (n < 0).astype(np.int64) * nb
    n = np.abs(n)

    max_exact = nb // 2
    is_small = n < max_exact
    with np.errstate(divide="ignore"):
        val_if_large = max_exact + (
            np.log(np.maximum(n, 1).astype(np.float64) / max_exact)
            / math.log(max_distance / max_exact)
            * (nb - max_exact)
        ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, nb - 1)
    ret = ret + np.where(is_small, n, val_if_large)
    return ret.astype(np.int32)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, std=0.02):
    return {
        "kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_mpnet(key, cfg: TextConfig) -> dict:
    d, f = cfg.hidden_size, cfg.intermediate_size
    kw, kp, kr, kl = jax.random.split(key, 4)

    def one(k):
        ks = jax.random.split(k, 6)
        return {
            "attn": {
                "q": _init_linear(ks[0], d, d),
                "k": _init_linear(ks[1], d, d),
                "v": _init_linear(ks[2], d, d),
                "o": _init_linear(ks[3], d, d),
            },
            "ln_attn": _init_ln(d),
            "mlp": {"fc1": _init_linear(ks[4], d, f), "fc2": _init_linear(ks[5], f, d)},
            "ln_out": _init_ln(d),
        }

    layers = jax.vmap(one)(jax.random.split(kl, cfg.num_hidden_layers))
    return {
        "embeddings": {
            "word": jax.random.normal(kw, (cfg.vocab_size, d), jnp.float32) * 0.02,
            "position": jax.random.normal(kp, (cfg.max_position_embeddings, d), jnp.float32) * 0.02,
            "ln": _init_ln(d),
        },
        "rel_bias": jax.random.normal(
            kr, (cfg.relative_attention_num_buckets, cfg.num_attention_heads), jnp.float32
        )
        * 0.02,
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def create_position_ids(input_ids: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    """RoBERTa/MPNet position ids (HF create_position_ids_from_input_ids)."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx


def mpnet_layer(x, p, rel, neg, cfg: TextConfig):
    """``rel``: (H, L, L) relative-position score bias (shared across the
    batch); ``neg``: (S, L) additive key-padding mask (0 real / -big pad)."""
    if cfg.pack_qkv:
        from radzero_tpu.models.vit import _packed_qkv_params

        wqkv, bqkv = _packed_qkv_params(p["attn"], x.dtype)
        qkv = jnp.dot(x, wqkv) + bqkv
        q, k, v = (split_heads(t, cfg.num_attention_heads)
                   for t in jnp.split(qkv, 3, axis=-1))
    else:
        q = split_heads(linear(x, p["attn"]["q"]), cfg.num_attention_heads)
        k = split_heads(linear(x, p["attn"]["k"]), cfg.num_attention_heads)
        v = split_heads(linear(x, p["attn"]["v"]), cfg.num_attention_heads)
    if cfg.attn_impl == "flash":
        from radzero_tpu.ops.flash_attention import flash_attention_bias

        a = merge_heads(
            flash_attention_bias(q, k, v, rel, neg, cfg.head_dim**-0.5)
        )
    else:
        bias = rel[None].astype(x.dtype) + neg[:, None, None, :].astype(x.dtype)
        a = merge_heads(attention(q, k, v, bias=bias, scale=cfg.head_dim**-0.5))
    if cfg.fuse_post:
        # one differentiable Pallas kernel pair for the whole
        # non-attention chain (ops/fused_layer.py:fused_mpnet_post_vjp)
        from radzero_tpu.ops.fused_layer import fused_mpnet_post_vjp

        s, l, d = x.shape
        cdt = x.dtype
        out = fused_mpnet_post_vjp(
            x.reshape(s * l, d), a.reshape(s * l, d),
            p["attn"]["o"]["kernel"].astype(cdt), p["attn"]["o"]["bias"].astype(cdt),
            p["ln_attn"]["scale"].astype(cdt), p["ln_attn"]["bias"].astype(cdt),
            p["mlp"]["fc1"]["kernel"].astype(cdt), p["mlp"]["fc1"]["bias"].astype(cdt),
            p["mlp"]["fc2"]["kernel"].astype(cdt), p["mlp"]["fc2"]["bias"].astype(cdt),
            p["ln_out"]["scale"].astype(cdt), p["ln_out"]["bias"].astype(cdt),
            cfg.layer_norm_eps,
        )
        return out.reshape(s, l, d)
    a = linear(a, p["attn"]["o"])
    x = layer_norm(x + a, p["ln_attn"], cfg.layer_norm_eps)

    m = linear(x, p["mlp"]["fc1"])
    m = gelu(m)
    m = linear(m, p["mlp"]["fc2"])
    return layer_norm(x + m, p["ln_out"], cfg.layer_norm_eps)


def mpnet_forward(
    params: dict,
    cfg: TextConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """(S, L) int ids + (S, L) mask -> (S, L, D) last hidden state."""
    emb = params["embeddings"]
    pos_ids = create_position_ids(input_ids, cfg.pad_token_id)
    x = jnp.take(emb["word"], input_ids, axis=0) + jnp.take(emb["position"], pos_ids, axis=0)
    x = layer_norm(x.astype(dtype), emb["ln"], cfg.layer_norm_eps)

    seq_len = input_ids.shape[1]
    buckets = jnp.asarray(
        relative_position_bucket_table(seq_len, cfg.relative_attention_num_buckets)
    )
    # (L, L, H) -> (H, L, L): shared position bias for every layer. Kept
    # fp32 and SEPARATE from the per-row key mask — the flash kernel takes
    # them as two operands so the (S, H, L, L) broadcast sum never
    # materialises in HBM (xla path rebuilds it per layer, fused by XLA).
    rel = jnp.take(params["rel_bias"].astype(jnp.float32), buckets, axis=0)
    rel = rel.transpose(2, 0, 1)
    if dtype != jnp.float32:
        rel = rel.astype(dtype).astype(jnp.float32)  # bf16 value parity

    # additive key-padding mask (HF get_extended_attention_mask semantics)
    neg_v = jnp.finfo(jnp.float32 if dtype == jnp.float32 else dtype).min
    neg = (1.0 - attention_mask.astype(jnp.float32)) * neg_v  # (S, L)

    layer_fn = mpnet_layer
    if remat:
        layer_fn = jax.checkpoint(mpnet_layer, static_argnums=(4,))

    def body(h, layer_params):
        return layer_fn(h, layer_params, rel, neg, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def masked_mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Sentence embedding by attention-masked mean pooling
    (ref modeling.py:146-156; sentence-transformers all-mpnet-base-v2 pooling)."""
    mask = attention_mask.astype(hidden.dtype)[..., None]
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.clip(jnp.sum(mask, axis=1), 1e-9, None)
    return summed / counts

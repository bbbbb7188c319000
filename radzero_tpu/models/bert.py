"""BERT text encoder (BioClinicalBERT family) + wordpiece aggregation.

The reference's alternate text tower (exp/cxr_pt/model/text_encoders.py:
8-28 'bioclinicalmpbert' via HF BertModel) with the BioViL-style
wordpiece->word aggregation over the last-n hidden layers
(aggregate_tokens, text_encoders.py:44-102) used when
``use_aggregate_tokens`` is set (modeling.py:170-193).

Architecture facts (HF BertModel): word + absolute-position +
token-type embeddings with LayerNorm(eps 1e-12); post-LN encoder blocks
(LN(x + attn), LN(y + ffn)), gelu; additive key-padding mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

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


@dataclass(frozen=True)
class BertConfig:
    model_type: str = "bert"
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    vocab_size: int = 28996
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


def bert_config_from_text(text_cfg) -> "BertConfig":
    """Adapt the composite model's TextConfig to a BertConfig."""
    return BertConfig(
        hidden_size=text_cfg.hidden_size,
        num_hidden_layers=text_cfg.num_hidden_layers,
        num_attention_heads=text_cfg.num_attention_heads,
        intermediate_size=text_cfg.intermediate_size,
        vocab_size=text_cfg.vocab_size,
        max_position_embeddings=text_cfg.max_position_embeddings,
    )


def _init_linear(key, d_in, d_out, std=0.02):
    return {
        "kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_bert(key, cfg: BertConfig) -> dict:
    d, f = cfg.hidden_size, cfg.intermediate_size
    kw, kp, kt, kl = jax.random.split(key, 4)

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

    return {
        "embeddings": {
            "word": jax.random.normal(kw, (cfg.vocab_size, d), jnp.float32) * 0.02,
            "position": jax.random.normal(kp, (cfg.max_position_embeddings, d), jnp.float32) * 0.02,
            "token_type": jax.random.normal(kt, (cfg.type_vocab_size, d), jnp.float32) * 0.02,
            "ln": _init_ln(d),
        },
        "layers": jax.vmap(one)(jax.random.split(kl, cfg.num_hidden_layers)),
    }


def _bert_layer(x, p, mask_bias, cfg: BertConfig):
    q = split_heads(linear(x, p["attn"]["q"]), cfg.num_attention_heads)
    k = split_heads(linear(x, p["attn"]["k"]), cfg.num_attention_heads)
    v = split_heads(linear(x, p["attn"]["v"]), cfg.num_attention_heads)
    a = linear(merge_heads(attention(q, k, v, bias=mask_bias)), p["attn"]["o"])
    x = layer_norm(x + a, p["ln_attn"], cfg.layer_norm_eps)
    m = linear(gelu(linear(x, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    return layer_norm(x + m, p["ln_out"], cfg.layer_norm_eps)


def bert_forward(
    params: dict,
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    *,
    dtype=jnp.float32,
    output_hidden_states: bool = False,
):
    """-> last hidden (S, L, D) [and all hidden states (n_layers+1, S, L, D)]."""
    emb = params["embeddings"]
    s, l = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    pos_ids = jnp.arange(l)[None, :]
    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + jnp.take(emb["position"], pos_ids, axis=0)
        + jnp.take(emb["token_type"], token_type_ids, axis=0)
    )
    x = layer_norm(x.astype(dtype), emb["ln"], cfg.layer_norm_eps)

    neg = jnp.finfo(jnp.float32).min
    bias = ((1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * neg).astype(dtype)

    if output_hidden_states:
        hiddens = [x]
        h = x
        n = jax.tree.leaves(params["layers"])[0].shape[0]
        for i in range(n):
            pi = jax.tree.map(lambda a: a[i], params["layers"])
            h = _bert_layer(h, pi, bias, cfg)
            hiddens.append(h)
        return h, jnp.stack(hiddens)

    def body(h, layer_params):
        return _bert_layer(h, layer_params, bias, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


# ---------------------------------------------------------------------------
# Wordpiece -> word aggregation (ref text_encoders.py:44-102)
# ---------------------------------------------------------------------------

def aggregate_tokens(
    embeddings: np.ndarray,      # (B, n_layers, L, D) last-n hidden layers
    tokens: List[List[str]],     # decoded wordpiece strings per sequence
) -> Tuple[np.ndarray, List[List[str]]]:
    """Merge '##'-continuation wordpieces by averaging their embeddings;
    special tokens ([CLS]/[SEP]/[PAD]) are dropped. Returns word-level
    embeddings padded to the max word count: (B, n_layers, W_max, D),
    plus the word strings per sequence."""
    b, n_layers, l, d = embeddings.shape
    all_words: List[List[str]] = []
    all_embs: List[np.ndarray] = []

    for i in range(b):
        words: List[str] = []
        embs: List[np.ndarray] = []
        cur_word = ""
        cur: List[np.ndarray] = []

        def flush():
            nonlocal cur_word, cur
            if cur:
                embs.append(np.mean(cur, axis=0))
                words.append(cur_word)
            cur_word, cur = "", []

        for t in range(min(l, len(tokens[i]))):
            tok = tokens[i][t]
            if tok in ("[CLS]", "[SEP]", "[PAD]", "<s>", "</s>", "<pad>"):
                flush()
                continue
            if tok.startswith("##"):
                cur_word += tok[2:]
                cur.append(embeddings[i, :, t])
            else:
                flush()
                cur_word = tok
                cur = [embeddings[i, :, t]]
        flush()
        all_words.append(words)
        all_embs.append(np.stack(embs, axis=1) if embs else np.zeros((n_layers, 0, d)))

    w_max = max(e.shape[1] for e in all_embs)
    out = np.zeros((b, n_layers, w_max, d), embeddings.dtype)
    for i, e in enumerate(all_embs):
        out[i, :, : e.shape[1]] = e
    return out, all_words


def bert_sentence_features(
    params: dict,
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    use_cls_token: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Sentence features: CLS or masked mean pooling (modeling.py:167-200)."""
    hidden = bert_forward(params, cfg, input_ids, attention_mask, dtype=dtype)
    if use_cls_token:
        return hidden[:, 0, :]
    mask = attention_mask.astype(hidden.dtype)[..., None]
    return jnp.sum(hidden * mask, axis=1) / jnp.clip(jnp.sum(mask, axis=1), 1e-9, None)


def convert_bert(sd: dict, num_layers: int) -> dict:
    """HF BertModel state_dict -> params pytree."""
    def lin(name):
        return {"kernel": sd[f"{name}.weight"].T.copy(), "bias": sd[f"{name}.bias"].copy()}

    def ln(name):
        return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}

    layers = []
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        layers.append(
            {
                "attn": {
                    "q": lin(f"{p}.attention.self.query"),
                    "k": lin(f"{p}.attention.self.key"),
                    "v": lin(f"{p}.attention.self.value"),
                    "o": lin(f"{p}.attention.output.dense"),
                },
                "ln_attn": ln(f"{p}.attention.output.LayerNorm"),
                "mlp": {
                    "fc1": lin(f"{p}.intermediate.dense"),
                    "fc2": lin(f"{p}.output.dense"),
                },
                "ln_out": ln(f"{p}.output.LayerNorm"),
            }
        )

    def stack(ds):
        out = {}
        for k, v in ds[0].items():
            out[k] = stack([x[k] for x in ds]) if isinstance(v, dict) else np.stack([x[k] for x in ds])
        return out

    return {
        "embeddings": {
            "word": sd["embeddings.word_embeddings.weight"].copy(),
            "position": sd["embeddings.position_embeddings.weight"].copy(),
            "token_type": sd["embeddings.token_type_embeddings.weight"].copy(),
            "ln": ln("embeddings.LayerNorm"),
        },
        "layers": stack(layers),
    }

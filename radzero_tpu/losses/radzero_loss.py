"""RadZeroLoss — the contrastive alignment objective, TPU-native.

Rebuild of ``RadZeroLoss`` (exp/cxr_pt/model/losses.py:33-184) under the
pjit global-view model:

- The reference loops over B images calling the text model per ragged
  sentence list (losses.py:135-147), pads, and ``dist.nn.all_gather``s
  text features, group_map, and vision tokens (losses.py:87-88,156-161).
  Here the batch arrives *already flattened and global*: a static
  ``(S, D)`` block of sentence features, a global ``group_map (S,)``,
  and a validity ``row_mask (S,)``. Under a sharded-in pjit, XLA's SPMD
  partitioner inserts the (differentiable) all-gathers that
  ``dist.nn.all_gather`` performed by hand — gradients flow natively.
- The shared modality LayerNorm (losses.py:51,90-91,163-164; torch
  default eps=1e-5) is applied to both vision tokens and text features
  with the *same* parameters.
- Temperatures are log-parameterised: ``loss_temperature`` init
  log(0.07), optional separate ``attn_temperature`` (losses.py:54-62).
- Text features of width 2*hidden keep only the second half
  (losses.py:144-146).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Dict, Optional

import jax.numpy as jnp
import numpy as np

from radzero_tpu.ops.layers import layer_norm
from radzero_tpu.ops.vlcabs import vlcabs_similarity
from radzero_tpu.losses.mpnce import multi_positive_nce_loss

if TYPE_CHECKING:  # annotation-only; a runtime import would cycle through models/__init__
    from radzero_tpu.models.configuration import LossConfig

_SHARED_LN_EPS = 1e-5  # torch nn.LayerNorm default (losses.py:51)


def init_radzero_loss(cfg: LossConfig) -> dict:
    params = {
        "log_loss_temperature": jnp.asarray([np.log(cfg.loss_temperature)], jnp.float32),
    }
    if cfg.attn_temperature is not None:
        params["log_attn_temperature"] = jnp.asarray(
            [np.log(cfg.attn_temperature)], jnp.float32
        )
    if cfg.use_layer_norm:
        params["layer_norm"] = {
            "scale": jnp.ones((cfg.hidden_dim,), jnp.float32),
            "bias": jnp.zeros((cfg.hidden_dim,), jnp.float32),
        }
    return params


def _select_text_features(
    cfg: LossConfig, raw: jnp.ndarray, normed: jnp.ndarray
) -> jnp.ndarray:
    feat = normed if cfg.text_features_l2_norm else raw  # losses.py:139-142
    if feat.shape[-1] == 2 * cfg.hidden_dim:
        feat = feat[:, cfg.hidden_dim :]  # losses.py:144-146
    return feat


def radzero_loss(
    params: dict,
    cfg: LossConfig,
    text_features_raw: jnp.ndarray,      # (S, D) features w/o l2 norm
    text_features_normed: jnp.ndarray,   # (S, D) l2-normed features
    group_map: jnp.ndarray,              # (S,) global image index per sentence
    row_mask: jnp.ndarray,               # (S,) 1.0 real / 0.0 padding
    vision_tokens: jnp.ndarray,          # (B, 1+L, D) global batch tokens
    *,
    need_scores: bool = False,
    compute_loss: bool = True,
    impl: str = "xla",
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    outputs: Dict[str, jnp.ndarray] = {}

    text_features = _select_text_features(cfg, text_features_raw, text_features_normed)

    if cfg.use_layer_norm:
        vision_tokens = layer_norm(vision_tokens, params["layer_norm"], _SHARED_LN_EPS)
        text_features = layer_norm(text_features, params["layer_norm"], _SHARED_LN_EPS)

    attn_tokens = vision_tokens if cfg.use_vision_cls_token else vision_tokens[:, 1:]

    loss_temp = jnp.exp(params["log_loss_temperature"][0])
    attn_temp = (
        jnp.exp(params["log_attn_temperature"][0])
        if "log_attn_temperature" in params
        else loss_temp
    )

    t2i_logits, scores = vlcabs_similarity(
        text_features,
        attn_tokens,
        sim_op=cfg.sim_op,
        temperature=attn_temp,
        need_scores=need_scores,
        impl=impl,
        mesh=mesh,
    )
    outputs["t2i_logits"] = t2i_logits  # (S, B)
    if scores is not None:
        outputs["similarity_scores"] = scores  # (B, S, L_attn)

    if compute_loss:
        t2i_loss = multi_positive_nce_loss(
            t2i_logits,
            group_map,
            temperature=loss_temp,
            row_sum=cfg.mpnce_row_sum,
            col_sum=cfg.mpnce_col_sum,
            row_mask=row_mask,
        )
        outputs["losses"] = {"t2i_loss": t2i_loss, "loss": t2i_loss}
    return outputs

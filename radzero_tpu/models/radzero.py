"""RadZeroModel — the composite vision-language alignment model.

Functional rebuild of ``CxrAlignModel`` (exp/cxr_pt/model/modeling.py:23-356):
frozen DINOv2 ViT tower -> trainable align transformer -> VL-CABS loss
head, plus the MPNet sentence tower, under one param pytree whose
top-level keys mirror the reference's module names so the finetune
policy ``module_to_update: [align_transformer, text_model, loss_fns]``
(model/__init__.py:58-79, radzero.yaml:50) carries over directly.

Param tree:
    vision_model      — ViT (frozen by default)
    align_transformer — stacked DINOv2 layers (+ optional trailing LN)
    text_model        — MPNet
    text_projector    — optional Linear(text_dim -> 2*hidden) (modeling.py:69-72)
    loss_fns          — {"RadZeroLoss": {...}, "OpenClipLoss": ..., ...}

Training batches are flattened & static (SURVEY.md §7): all sentences of
the global batch in one (S, L) block with ``group_map``/``row_mask``,
replacing the reference's per-image Python-loop text forwards
(losses.py:135-147).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from radzero_tpu.losses.clip import (
    clip_loss,
    init_clip_loss,
    init_siglip_loss,
    siglip_loss,
)
from radzero_tpu.losses.radzero_loss import init_radzero_loss, radzero_loss
from radzero_tpu.models.configuration import RadZeroConfig
from radzero_tpu.models.mpnet import init_mpnet, masked_mean_pool, mpnet_forward
from radzero_tpu.models.vit import init_vit, init_vit_layers, vit_encoder, vit_forward
from radzero_tpu.ops.layers import l2_normalize, layer_norm, linear


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_radzero(
    key,
    cfg: RadZeroConfig,
    loss_apply: tuple[str, ...] = ("RadZeroLoss",),
) -> dict:
    from radzero_tpu.models.align import build_align_adapter

    kv, ka, kt, kp = jax.random.split(key, 4)
    align_init, _ = build_align_adapter(cfg.align.model_type)

    vision_type = getattr(cfg.vision, "model_type", "dinov2")
    if vision_type in ("dinov2", "raddino"):  # RadDINO: same architecture
        vision_params = init_vit(kv, cfg.vision)
    else:
        from radzero_tpu.models.encoders import build_vision_encoder

        vision_init, _ = build_vision_encoder(vision_type)
        vision_params = vision_init(kv, cfg.vision)

    text_type = getattr(cfg.text, "model_type", "mpnet")
    if text_type == "mpnet":
        text_params = init_mpnet(kt, cfg.text)
    elif text_type in ("bert", "bioclinicalmpbert", "biomedclip"):
        from radzero_tpu.models.bert import bert_config_from_text, init_bert

        text_params = init_bert(kt, bert_config_from_text(cfg.text))
    else:
        from radzero_tpu.models.encoders import build_text_encoder

        text_init, _ = build_text_encoder(text_type)
        text_params = text_init(kt, cfg.text)

    params: dict = {
        "vision_model": vision_params,
        "align_transformer": align_init(ka, cfg.align),
        "text_model": text_params,
    }
    if cfg.text.use_text_projection:
        d_in, d_out = cfg.text.hidden_size, 2 * cfg.align.hidden_size
        params["text_projector"] = {
            "kernel": jax.random.normal(kp, (d_in, d_out), jnp.float32) * 0.02,
            "bias": jnp.zeros((d_out,), jnp.float32),
        }
    loss_fns = {}
    for name in loss_apply:
        if name == "RadZeroLoss":
            loss_fns[name] = init_radzero_loss(cfg.loss)
        elif name == "OpenClipLoss":
            loss_fns[name] = init_clip_loss()
        elif name == "OpenSigLipLoss":
            loss_fns[name] = init_siglip_loss()
        else:
            raise NotImplementedError(name)
    params["loss_fns"] = loss_fns
    return params


# ---------------------------------------------------------------------------
# Submodel forwards
# ---------------------------------------------------------------------------

def forward_vision(
    params: dict,
    cfg: RadZeroConfig,
    pixel_values: Optional[jnp.ndarray],  # (B, H, W, 3) NHWC float
    *,
    dtype=jnp.float32,
    remat: bool = False,
    stop_tower_gradient: bool = False,
    tower_tokens: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Vision tower + align adapter + pooled image features
    (ref modeling.py:96-123). The tower dispatches on
    ``cfg.vision.model_type`` through the encoder registry
    (dinov2 default; clip/siglip/xrayclip/biomedclip/m3ae alternates —
    ref build_vision_encoder, vision_encoders.py:23-43).

    ``stop_tower_gradient`` cuts the tape between the (frozen) tower and
    the trainable align adapter, so autodiff keeps no tower residuals.

    ``tower_tokens``: precomputed tower output (B, L[, padded], D) —
    skips the tower entirely (the frozen-tower activation cache,
    train/tower_cache.py). Tokens must come from ``make_tower_fn`` with
    the same config; a lane-padded L is recognised against the
    cfg-derived real length (inputs are processor-resized to
    ``cfg.vision.img_size``, so the real token count is static)."""
    from radzero_tpu.models.align import build_align_adapter

    model_type = getattr(cfg.vision, "model_type", "dinov2")
    real_len = None
    if tower_tokens is not None:
        tokens = tower_tokens
        if model_type in ("dinov2", "raddino"):
            p = cfg.vision.patch_size
            l_real = 1 + (cfg.vision.img_size // p) ** 2
            if tokens.shape[1] != l_real:
                real_len = l_real
    elif model_type in ("dinov2", "raddino"):
        # persistent lane padding: pad once before the 12-layer tower,
        # keep it through the align adapter, slice once after
        keep_padded = getattr(cfg.vision, "attn_impl", "xla") in (
            "flash", "fused", "packed", "fused_vjp",
        )
        tokens = vit_forward(
            params["vision_model"], cfg.vision, pixel_values, dtype=dtype, remat=remat,
            keep_padded=keep_padded,
        )
        h, w = pixel_values.shape[1], pixel_values.shape[2]
        l_real = 1 + (h // cfg.vision.patch_size) * (w // cfg.vision.patch_size)
        if keep_padded and tokens.shape[1] != l_real:
            real_len = l_real
    else:
        from radzero_tpu.models.encoders import build_vision_encoder

        _, vision_apply = build_vision_encoder(model_type)
        tokens = vision_apply(params["vision_model"], cfg.vision, pixel_values, dtype=dtype)
    if stop_tower_gradient:
        tokens = jax.lax.stop_gradient(tokens)
    if (
        real_len is not None
        and cfg.align.model_type == "align_transformer"
        and getattr(cfg.align, "attn_impl", "xla") == "xla"
    ):
        # the xla attention branch has no key mask: persistent lane
        # padding would act as real (zero-vector) attention keys and
        # deflate every token's softmax — slice it off here instead
        tokens = tokens[:, :real_len]
        real_len = None
    _, align_apply = build_align_adapter(cfg.align.model_type)
    tokens = align_apply(
        params["align_transformer"], cfg.align, tokens, remat=remat, real_len=real_len
    )
    if real_len is not None:
        tokens = tokens[:, :real_len]

    cls_token = tokens[:, 0]
    patch_tokens = tokens[:, 1:]
    image_features = jnp.concatenate([cls_token, jnp.mean(patch_tokens, axis=1)], axis=-1)
    image_features = l2_normalize(image_features)
    return {
        "vision_tokens": tokens,
        "image_cls_token": cls_token,
        "image_patch_tokens": patch_tokens,
        "image_features": image_features,
    }


def forward_text(
    params: dict,
    cfg: RadZeroConfig,
    input_ids: jnp.ndarray,       # (S, L) int32
    attention_mask: jnp.ndarray,  # (S, L)
    *,
    dtype=jnp.float32,
    remat: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Text tower + optional projector + masked mean pooling
    (ref modeling.py:125-206). Dispatches on ``cfg.text.model_type``:
    mpnet (default) or bert/bioclinicalmpbert."""
    text_type = getattr(cfg.text, "model_type", "mpnet")
    if getattr(cfg.text, "remat", None) is not None:
        # per-module remat override (see TextConfig.remat)
        remat = cfg.text.remat
    if text_type == "mpnet":
        hidden = mpnet_forward(
            params["text_model"], cfg.text, input_ids, attention_mask, dtype=dtype,
            remat=remat,
        )
        # MPNet path: projector applied to TOKEN embeddings, pre-pooling
        # (ref modeling.py:139-140)
        if cfg.text.use_text_projection:
            hidden = linear(hidden, params["text_projector"])
        if cfg.text.use_cls_token:
            text_features = hidden[:, 0, :]
        else:
            text_features = masked_mean_pool(hidden, attention_mask)
    elif text_type in ("bert", "bioclinicalmpbert", "biomedclip"):
        # biomedclip: open_clip's PubMedBERT text tower is BERT-arch; the
        # reference builds it (text_encoders.py:16-19) but its composite
        # forward_text_model raises NotImplementedError on it
        from radzero_tpu.models.bert import bert_config_from_text, bert_forward

        hidden = bert_forward(
            params["text_model"], bert_config_from_text(cfg.text), input_ids,
            attention_mask, dtype=dtype,
        )
        if cfg.text.use_cls_token:
            text_features = hidden[:, 0, :]
        else:
            text_features = masked_mean_pool(hidden, attention_mask)
        # BERT path: projector applied to POOLED features (ref modeling.py:202-203)
        if cfg.text.use_text_projection:
            text_features = linear(text_features, params["text_projector"])
    else:
        raise NotImplementedError(f"text model_type {text_type!r} in composite model")
    return {
        "text_features_wo_l2_norm": text_features,
        "text_features": l2_normalize(text_features),
    }


# ---------------------------------------------------------------------------
# Training forward (global-view batch)
# ---------------------------------------------------------------------------

def forward_train(
    params: dict,
    cfg: RadZeroConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    loss_ratio: Optional[Dict[str, float]] = None,
    dtype=jnp.float32,
    remat: bool = False,
    stop_vision_gradient: bool = False,
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """One training forward over the flattened global batch
    (ref modeling.py:213-276).

    batch keys:
        pixel_values         (B, H, W, 3)   — or ``tower_tokens``
                             (B, L[, padded], D) precomputed frozen-tower
                             output (train/tower_cache.py), which skips
                             the vision tower
        input_ids            (S, L)   flattened sentences, global order
        attention_mask       (S, L)
        group_map            (S,)     global image index per sentence
        row_mask             (S,)     1.0 real sentence / 0.0 padding
        random_input_ids     (B, L)   one random positive per image
                                      (only if CLIP/SigLIP losses active)
        random_attention_mask(B, L)
    """
    loss_ratio = loss_ratio or {name: 1.0 for name in params["loss_fns"]}
    vision = forward_vision(
        params, cfg, batch.get("pixel_values"), dtype=dtype, remat=remat,
        stop_tower_gradient=stop_vision_gradient,
        tower_tokens=batch.get("tower_tokens"),
    )

    losses: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, jnp.float32)

    for name, lparams in params["loss_fns"].items():
        if name == "RadZeroLoss":
            text = forward_text(
                params, cfg, batch["input_ids"], batch["attention_mask"], dtype=dtype,
                remat=remat,
            )
            if "row_gather" in batch:
                # deduped text block (PackSpec.dedup_slots): the tower ran
                # on the U unique sentences; gather features back to the
                # S loss rows. The gather's VJP scatter-adds duplicate
                # rows' gradients, so loss and grads equal the non-dedup
                # computation exactly (the reference encodes duplicates
                # per image, losses.py:135-147).
                g = batch["row_gather"]
                text = {
                    "text_features_wo_l2_norm": text["text_features_wo_l2_norm"][g],
                    "text_features": text["text_features"][g],
                }
            train_impl = (
                "fused_train"
                if (cfg.loss.train_impl == "fused" and cfg.loss.sim_op == "cos")
                else "xla"
            )
            out = radzero_loss(
                lparams,
                cfg.loss,
                text["text_features_wo_l2_norm"],
                text["text_features"],
                batch["group_map"],
                batch["row_mask"],
                vision["vision_tokens"],
                impl=train_impl,
                mesh=mesh,
            )
            losses["t2i_loss"] = out["losses"]["t2i_loss"]
            losses["radzero_loss"] = out["losses"]["loss"]
            loop_loss = out["losses"]["loss"]
        elif name in ("OpenClipLoss", "OpenSigLipLoss"):
            text = forward_text(
                params, cfg, batch["random_input_ids"], batch["random_attention_mask"],
                dtype=dtype, remat=remat,
            )
            fn = clip_loss if name == "OpenClipLoss" else siglip_loss
            key = "clip_loss" if name == "OpenClipLoss" else "siglip_loss"
            loop_loss = fn(lparams, vision["image_features"], text["text_features"])
            losses[key] = loop_loss
        else:
            raise NotImplementedError(name)
        total = total + loop_loss * loss_ratio.get(name, 1.0)

    losses["loss"] = total
    return {"losses": losses, **vision}


# ---------------------------------------------------------------------------
# Zero-shot logits (public inference path)
# ---------------------------------------------------------------------------

def compute_logits(
    params: dict,
    cfg: RadZeroConfig,
    pixel_values: jnp.ndarray,    # (B, H, W, 3)
    input_ids: jnp.ndarray,       # (N, L) one row per prompt sentence
    attention_mask: jnp.ndarray,  # (N, L)
    *,
    dtype=jnp.float32,
    remat: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Zero-shot scoring: (B images) x (N prompts) -> logits + maps
    (ref modeling.py:278-328, 'radzero' branch).

    Returns:
        logits             (B, N)       = t2i_logits.T / exp(loss_temperature)
        similarity_scores  (B, N, L-1)  pre-softmax cos maps, CLS column
                                        removed (modeling.py:311-317)
    """
    if cfg.compute_logits_type != "radzero":
        return _compute_logits_alignment(
            params, cfg, pixel_values, input_ids, attention_mask, dtype=dtype, remat=remat
        )

    vision = forward_vision(params, cfg, pixel_values, dtype=dtype, remat=remat)
    text = forward_text(params, cfg, input_ids, attention_mask, dtype=dtype)

    # forward-only path: use the fused Pallas VL-CABS kernel for cos sim
    impl = "fused" if cfg.loss.sim_op == "cos" else "xla"
    lparams = params["loss_fns"]["RadZeroLoss"]
    out = radzero_loss(
        lparams,
        cfg.loss,
        text["text_features_wo_l2_norm"],
        text["text_features"],
        group_map=jnp.arange(input_ids.shape[0]),
        row_mask=jnp.ones((input_ids.shape[0],), jnp.float32),
        vision_tokens=vision["vision_tokens"],
        need_scores=True,
        compute_loss=False,
        impl=impl,
    )
    scores = out["similarity_scores"]  # (B, N, L_attn)
    if cfg.loss.use_vision_cls_token:
        scores = scores[:, :, 1:]  # strip CLS column (modeling.py:316-317)

    loss_temp = jnp.exp(lparams["log_loss_temperature"][0])
    logits = out["t2i_logits"].T / loss_temp  # (B, N) (modeling.py:324-328)
    return {"logits": logits, "similarity_scores": scores}


def _compute_logits_alignment(
    params, cfg, pixel_values, input_ids, attention_mask, *, dtype, remat
):
    """cls_alignment / global_alignment alternates (modeling.py:330-353)."""
    vision = forward_vision(params, cfg, pixel_values, dtype=dtype, remat=remat)
    text = forward_text(params, cfg, input_ids, attention_mask, dtype=dtype)
    key_features = text["text_features"]  # (N, D)

    if cfg.compute_logits_type == "cls_alignment":
        logits = vision["image_cls_token"] @ key_features.T
        return {"logits": logits}
    if cfg.compute_logits_type == "global_alignment":
        logits = vision["image_features"] @ key_features.T
        hidden = cfg.align.hidden_size
        scores = jnp.einsum(
            "ind,jd->ijn", vision["image_patch_tokens"], key_features[:, hidden:]
        )
        return {"logits": logits, "similarity_scores": scores}
    raise NotImplementedError(cfg.compute_logits_type)

"""Encoder factories: registry dispatch by model_type.

Replaces the reference's if/elif factories
(exp/cxr_pt/model/vision_encoders.py:23-43 build_vision_encoder;
text_encoders.py:8-28 build_text_encoder) — and its ``eval(name)``
instantiation quirk — with the Registry pattern. Each entry returns
``(init_fn(key, cfg), apply_fn(params, cfg, ...))`` pairs.

Vision entries produce the (B, 1+L, D) token layout the composite model
consumes; text entries produce sentence features.
"""

from __future__ import annotations

import jax.numpy as jnp

from radzero_tpu.utils.registry import TEXT_ENCODERS, VISION_ENCODERS


# ---------------------------------------------------------------------------
# Vision
# ---------------------------------------------------------------------------

@VISION_ENCODERS.register("dinov2")
@VISION_ENCODERS.register("raddino")  # RadDINO = DINOv2-B fine-tuned on CXR:
def _dinov2():                        # identical architecture + HF layout
    from radzero_tpu.models.vit import init_vit, vit_forward

    return init_vit, vit_forward


@VISION_ENCODERS.register("clip")
@VISION_ENCODERS.register("clip_vision_model")
@VISION_ENCODERS.register("xrayclip")
@VISION_ENCODERS.register("biomedclip")
def _clip():
    from radzero_tpu.models.clip_vit import clip_vit_forward, init_clip_vit

    return init_clip_vit, clip_vit_forward


@VISION_ENCODERS.register("siglip")
@VISION_ENCODERS.register("siglip_vision_model")
def _siglip():
    from radzero_tpu.models.clip_vit import clip_vit_forward, init_clip_vit

    return init_clip_vit, clip_vit_forward


@VISION_ENCODERS.register("sam")
def _sam():
    # the reference ACCEPTS "sam" configs but its factory has no branch
    # for them (NotImplementedError, vision_encoders.py:40-41); this
    # entry implements the tower for real (models/sam_vit.py)
    from radzero_tpu.models.sam_vit import init_sam_vit, sam_vit_forward

    return init_sam_vit, sam_vit_forward


@VISION_ENCODERS.register("m3ae")
@VISION_ENCODERS.register("mae")
def _mae():
    from radzero_tpu.models.mae_vit import init_mae_vit, mae_vision_tokens

    return init_mae_vit, mae_vision_tokens


# ---------------------------------------------------------------------------
# Text
# ---------------------------------------------------------------------------

@TEXT_ENCODERS.register("mpnet")
def _mpnet():
    from radzero_tpu.models.mpnet import init_mpnet, mpnet_forward

    return init_mpnet, mpnet_forward


@TEXT_ENCODERS.register("bert")
@TEXT_ENCODERS.register("bioclinicalmpbert")
@TEXT_ENCODERS.register("biomedclip")  # open_clip PubMedBERT text tower =
def _bert():                           # BERT architecture (ref
    # text_encoders.py:16-19 builds it, but the reference's composite
    # forward then crashes on it — forward_text_model handles only
    # MPNetModel/BertModel instances (modeling.py:128-206)
    from radzero_tpu.models.bert import bert_forward, init_bert

    return init_bert, bert_forward


@TEXT_ENCODERS.register("clip_text")
@TEXT_ENCODERS.register("clip_text_model")
@TEXT_ENCODERS.register("siglip_text")
@TEXT_ENCODERS.register("siglip_text_model")
def _clip_text():
    from radzero_tpu.models.clip_text import clip_text_forward, init_clip_text

    return init_clip_text, clip_text_forward


def build_vision_encoder(model_type: str):
    return VISION_ENCODERS.get(model_type)()


def build_text_encoder(model_type: str):
    return TEXT_ENCODERS.get(model_type)()

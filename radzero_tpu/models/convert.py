"""Torch/HF state_dict -> radzero_tpu param-pytree converters.

Pure numpy name-mapping (no torch import): callers pass
``{name: np.ndarray}``. Used by the offline checkpoint converter tool
(tools/convert_checkpoint.py) and the torch-oracle parity tests.

Weight-layout conventions translated:
- torch Linear weight (out, in)        -> kernel (in, out)        [transpose]
- torch Conv2d patch kernel (D,C,P,P)  -> (P*P*C, D) matching
  :func:`radzero_tpu.models.vit.patchify`'s (ph, pw, c) ordering
- per-layer tensors stacked on a leading axis for ``lax.scan``

Source name schemas: HF ``Dinov2Model`` / ``Dinov2Encoder`` (the
reference's vision tower + align transformer,
exp/cxr_pt/model/vision_encoders.py:23-43, align_transformers.py:23-45)
and HF ``MPNetModel`` (text tower, text_encoders.py:8-28).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


Array = np.ndarray
StateDict = Dict[str, Array]


def _lin(sd: StateDict, name: str) -> dict:
    return {"kernel": sd[f"{name}.weight"].T.copy(), "bias": sd[f"{name}.bias"].copy()}


def _ln(sd: StateDict, name: str) -> dict:
    return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}


def _stack(dicts: list) -> dict:
    """List of identical pytrees -> one pytree of stacked leaves."""
    out = {}
    for k, v in dicts[0].items():
        if isinstance(v, dict):
            out[k] = _stack([d[k] for d in dicts])
        else:
            out[k] = np.stack([d[k] for d in dicts], axis=0)
    return out


def convert_dinov2_layers(sd: StateDict, num_layers: int, prefix: str = "encoder.layer") -> dict:
    layers = []
    for i in range(num_layers):
        p = f"{prefix}.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{p}.norm1"),
                "attn": {
                    "q": _lin(sd, f"{p}.attention.attention.query"),
                    "k": _lin(sd, f"{p}.attention.attention.key"),
                    "v": _lin(sd, f"{p}.attention.attention.value"),
                    "o": _lin(sd, f"{p}.attention.output.dense"),
                },
                "ls1": sd[f"{p}.layer_scale1.lambda1"].copy(),
                "ln2": _ln(sd, f"{p}.norm2"),
                "mlp": {
                    "fc1": _lin(sd, f"{p}.mlp.fc1"),
                    "fc2": _lin(sd, f"{p}.mlp.fc2"),
                },
                "ls2": sd[f"{p}.layer_scale2.lambda1"].copy(),
            }
        )
    return _stack(layers)


def convert_dinov2(sd: StateDict, num_layers: int, use_final_layernorm: bool = True) -> dict:
    """HF Dinov2Model state_dict -> vit params pytree."""
    w = sd["embeddings.patch_embeddings.projection.weight"]  # (D, C, P, P)
    d = w.shape[0]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, d).copy()  # (P*P*C, D), (ph,pw,c) order
    params = {
        "patch_embed": {
            "kernel": kernel,
            "bias": sd["embeddings.patch_embeddings.projection.bias"].copy(),
        },
        "cls_token": sd["embeddings.cls_token"].copy(),
        "pos_embed": sd["embeddings.position_embeddings"].copy(),
        "layers": convert_dinov2_layers(sd, num_layers),
    }
    if use_final_layernorm:
        params["final_ln"] = _ln(sd, "layernorm")
    return params


def convert_dinov2_encoder_only(sd: StateDict, num_layers: int, prefix: str = "layer") -> dict:
    """HF Dinov2Encoder (align transformer) state_dict -> stacked layers pytree."""
    return convert_dinov2_layers(sd, num_layers, prefix=prefix)


def _strip_prefix(sd: StateDict, prefix: str) -> StateDict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_radzero_checkpoint(
    sd: StateDict,
    vision_layers: int = 12,
    align_layers: int = 2,
    text_layers: int = 12,
) -> dict:
    """Full reference CxrAlignModel state_dict -> radzero_tpu param tree.

    Source module layout (exp/cxr_pt/model/modeling.py:51-94):
        vision_model.*                       (HF Dinov2Model)
        align_transformer.transformer_layers.* (HF Dinov2Encoder)
        align_transformer.layer_norm.*       (optional)
        text_model.*                         (HF MPNetModel)
        text_projector.*                     (optional Linear)
        loss_fns.RadZeroLoss.layer_norm.*    shared modality LN
        loss_fns.RadZeroLoss.loss_temperature  log-temp scalar
        loss_fns.RadZeroLoss.attn_temperature  optional log-temp
    """
    params: dict = {
        "vision_model": convert_dinov2(_strip_prefix(sd, "vision_model."), vision_layers),
        "align_transformer": {
            "layers": convert_dinov2_layers(
                sd, align_layers, prefix="align_transformer.transformer_layers.layer"
            )
        },
        "text_model": convert_mpnet(_strip_prefix(sd, "text_model."), text_layers),
    }
    if "align_transformer.layer_norm.weight" in sd:
        params["align_transformer"]["layer_norm"] = _ln(sd, "align_transformer.layer_norm")
    if "text_projector.weight" in sd:
        params["text_projector"] = _lin(sd, "text_projector")

    loss: dict = {}
    if "loss_fns.RadZeroLoss.loss_temperature" in sd:
        loss["log_loss_temperature"] = sd["loss_fns.RadZeroLoss.loss_temperature"].copy()
    if "loss_fns.RadZeroLoss.attn_temperature" in sd:
        loss["log_attn_temperature"] = sd["loss_fns.RadZeroLoss.attn_temperature"].copy()
    if "loss_fns.RadZeroLoss.layer_norm.weight" in sd:
        loss["layer_norm"] = _ln(sd, "loss_fns.RadZeroLoss.layer_norm")
    params["loss_fns"] = {"RadZeroLoss": loss}

    clip: dict = {}
    if "loss_fns.OpenClipLoss.logit_scale" in sd:
        clip["log_logit_scale"] = sd["loss_fns.OpenClipLoss.logit_scale"].copy()
        params["loss_fns"]["OpenClipLoss"] = clip
    sig: dict = {}
    if "loss_fns.OpenSigLipLoss.logit_scale" in sd:
        sig["log_logit_scale"] = sd["loss_fns.OpenSigLipLoss.logit_scale"].copy()
        sig["logit_bias"] = sd["loss_fns.OpenSigLipLoss.logit_bias"].copy()
        params["loss_fns"]["OpenSigLipLoss"] = sig
    return params


def convert_sam(sd: StateDict, num_layers: int) -> dict:
    """HF ``SamVisionEncoder`` state_dict -> sam_vit params pytree.

    Accepts either bare vision-encoder names or a full ``SamModel``
    state_dict (``vision_encoder.`` prefix stripped). Layers stay a
    LIST (window/global layers carry different rel-pos table shapes, so
    no leading-axis stack)."""
    if any(k.startswith("vision_encoder.") for k in sd):
        sd = _strip_prefix(sd, "vision_encoder.")
    w = sd["patch_embed.projection.weight"]  # (D, C, P, P)
    d = w.shape[0]
    params: dict = {
        "patch_embed": {
            "kernel": w.transpose(2, 3, 1, 0).reshape(-1, d).copy(),
            "bias": sd["patch_embed.projection.bias"].copy(),
        }
    }
    if "pos_embed" in sd:
        params["pos_embed"] = sd["pos_embed"].copy()  # (1, G, G, D)

    layers = []
    for i in range(num_layers):
        p = f"layers.{i}"
        layer = {
            "ln1": _ln(sd, f"{p}.layer_norm1"),
            "qkv": {"kernel": sd[f"{p}.attn.qkv.weight"].T.copy()},
            "proj": _lin(sd, f"{p}.attn.proj"),
            "ln2": _ln(sd, f"{p}.layer_norm2"),
            "mlp": {
                "fc1": _lin(sd, f"{p}.mlp.lin1"),
                "fc2": _lin(sd, f"{p}.mlp.lin2"),
            },
        }
        if f"{p}.attn.qkv.bias" in sd:
            layer["qkv"]["bias"] = sd[f"{p}.attn.qkv.bias"].copy()
        if f"{p}.attn.rel_pos_h" in sd:
            layer["rel_pos_h"] = sd[f"{p}.attn.rel_pos_h"].copy()
            layer["rel_pos_w"] = sd[f"{p}.attn.rel_pos_w"].copy()
        layers.append(layer)
    params["layers"] = layers

    params["neck"] = {
        # conv1 1x1 (out, D, 1, 1) -> (D, out) matmul kernel
        "conv1": sd["neck.conv1.weight"][:, :, 0, 0].T.copy(),
        "ln1": _ln(sd, "neck.layer_norm1"),
        # conv2 3x3 (out, in, kh, kw) OIHW -> HWIO
        "conv2": sd["neck.conv2.weight"].transpose(2, 3, 1, 0).copy(),
        "ln2": _ln(sd, "neck.layer_norm2"),
    }
    return params


def convert_mpnet(sd: StateDict, num_layers: int) -> dict:
    """HF MPNetModel state_dict -> mpnet params pytree."""
    layers = []
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        layers.append(
            {
                "attn": {
                    "q": _lin(sd, f"{p}.attention.attn.q"),
                    "k": _lin(sd, f"{p}.attention.attn.k"),
                    "v": _lin(sd, f"{p}.attention.attn.v"),
                    "o": _lin(sd, f"{p}.attention.attn.o"),
                },
                "ln_attn": _ln(sd, f"{p}.attention.LayerNorm"),
                "mlp": {
                    "fc1": _lin(sd, f"{p}.intermediate.dense"),
                    "fc2": _lin(sd, f"{p}.output.dense"),
                },
                "ln_out": _ln(sd, f"{p}.output.LayerNorm"),
            }
        )
    return {
        "embeddings": {
            "word": sd["embeddings.word_embeddings.weight"].copy(),
            "position": sd["embeddings.position_embeddings.weight"].copy(),
            "ln": _ln(sd, "embeddings.LayerNorm"),
        },
        "rel_bias": sd["encoder.relative_attention_bias.weight"].copy(),
        "layers": _stack(layers),
    }

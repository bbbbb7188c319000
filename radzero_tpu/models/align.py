"""Align adapter variants.

The reference's align-transformer factory offers four adapters
(exp/cxr_pt/model/align_transformers.py:8-83): the default
``align_transformer`` (N DINOv2 layers + optional LN — implemented in
radzero_tpu.models.vit / radzero.py), plus ``identity``, ``linear``,
and ``mlp`` baselines. This module provides those alternates and the
dispatching apply used by the composite model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from radzero_tpu.models.configuration import AlignConfig
from radzero_tpu.ops.layers import layer_norm, linear
from radzero_tpu.models.vit import init_vit_layers, vit_encoder
from radzero_tpu.utils.registry import ALIGN_ADAPTERS


def _init_linear(key, d_in, d_out, std=0.02):
    return {
        "kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


@ALIGN_ADAPTERS.register("align_transformer")
def _align_transformer():
    def init(key, cfg: AlignConfig) -> dict:
        params = {"layers": init_vit_layers(key, cfg.as_vit())}
        if cfg.use_layer_norm:
            params["layer_norm"] = {
                "scale": jnp.ones((cfg.hidden_size,), jnp.float32),
                "bias": jnp.zeros((cfg.hidden_size,), jnp.float32),
            }
        return params

    def apply(params, cfg: AlignConfig, tokens, *, remat=False, real_len=None):
        if cfg.remat is not None:
            # per-module remat override: the 2 adapter layers' saved
            # activations are small (~2 x B*L*D vs the text tower's 34 GB
            # no-remat blowup), so skipping their forward recompute can
            # pay when HBM allows — measured knob, see ROADMAP.md
            remat = cfg.remat
        tokens = vit_encoder(
            params["layers"], cfg.as_vit(), tokens, remat=remat, real_len=real_len
        )
        if cfg.use_layer_norm:
            tokens = layer_norm(tokens, params["layer_norm"], cfg.layer_norm_eps)
        return tokens

    return init, apply


@ALIGN_ADAPTERS.register("identity")
def _identity():
    def init(key, cfg):
        return {}

    def apply(params, cfg, tokens, *, remat=False, real_len=None):
        return tokens

    return init, apply


@ALIGN_ADAPTERS.register("linear")
def _linear():
    def init(key, cfg: AlignConfig):
        return {"linear": _init_linear(key, cfg.hidden_size, cfg.hidden_size)}

    def apply(params, cfg, tokens, *, remat=False, real_len=None):
        return linear(tokens, params["linear"])

    return init, apply


@ALIGN_ADAPTERS.register("mlp")
def _mlp():
    """3-hidden-layer ReLU MLP 768->1024->1024->1024->768
    (ref align_transformers.py:65-83; dropout inactive at eval)."""

    def init(key, cfg: AlignConfig):
        d, hdim = cfg.hidden_size, 1024
        ks = jax.random.split(key, 4)
        return {
            "fc0": _init_linear(ks[0], d, hdim),
            "fc1": _init_linear(ks[1], hdim, hdim),
            "fc2": _init_linear(ks[2], hdim, hdim),
            "fc3": _init_linear(ks[3], hdim, d),
        }

    def apply(params, cfg, tokens, *, remat=False, real_len=None):
        x = jax.nn.relu(linear(tokens, params["fc0"]))
        x = jax.nn.relu(linear(x, params["fc1"]))
        x = jax.nn.relu(linear(x, params["fc2"]))
        return linear(x, params["fc3"])

    return init, apply


def build_align_adapter(model_type: str):
    return ALIGN_ADAPTERS.get(model_type)()

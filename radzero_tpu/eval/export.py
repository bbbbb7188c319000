"""AOT model export for serving.

Serialises the jitted zero-shot function (StableHLO via ``jax.export``)
together with its parameters so a serving process starts without
retracing or recompiling Python model code — the deployment story the
reference lacks (its quickstart re-instantiates torch modules per
process).

    bundle_dir = export_zero_shot(params, cfg, out_dir,
                                  batch_size=16, n_prompts=20, max_tokens=32)
    runner = load_zero_shot(bundle_dir)
    logits, maps = runner(pixel_values, input_ids, attention_mask)

The export embeds the parameters as constants (one self-contained
artifact); shapes are fixed at export time (one bundle per serving
bucket, matching the ServingEngine's static-shape contract).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from radzero_tpu.models.configuration import RadZeroConfig
from radzero_tpu.models.radzero import compute_logits


def export_zero_shot(
    params: dict,
    cfg: RadZeroConfig,
    out_dir: str,
    *,
    batch_size: int = 16,
    n_prompts: int = 20,
    max_tokens: int = 32,
    dtype=jnp.bfloat16,
    from_uint8: bool = False,
    channels: int = 3,
    image_mean=None,
    image_std=None,
    fused_tower: bool = None,
) -> str:
    """Serialize compute_logits at fixed shapes; returns the bundle dir.

    ``from_uint8``: bake the ServingEngine's split pipeline into the
    bundle — inputs are resized uint8 (B, img, img, channels) and the
    rescale+normalise (and channel broadcast for channels=1 grayscale
    sources) happen inside the exported program. ``image_mean/std``
    default to the CLIP statistics the flagship Blip processor uses.
    ``fused_tower=None`` (default) resolves to True on TPU only — a
    bundle exported on a CPU host would otherwise bake interpret-mode
    Pallas kernels into the program."""
    os.makedirs(out_dir, exist_ok=True)
    if fused_tower is None:
        fused_tower = jax.default_backend() == "tpu"
    if fused_tower:
        from radzero_tpu.models.configuration import with_fused_towers

        # forward-only Pallas-fused serving layers (ops/fused_layer.py):
        # exported programs never differentiate
        cfg = with_fused_towers(cfg)
    from radzero_tpu.models.configuration import resolve_backend_impls

    cfg = resolve_backend_impls(cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    if from_uint8:
        from radzero_tpu.data.processing import CLIP_MEAN, CLIP_STD
        from radzero_tpu.ops.layers import normalize_pixels

        image_mean = tuple(image_mean) if image_mean is not None else CLIP_MEAN
        image_std = tuple(image_std) if image_std is not None else CLIP_STD

    def fn(pixel_values, input_ids, attention_mask):
        if from_uint8:
            if pixel_values.shape[-1] == 1:
                pixel_values = jnp.broadcast_to(
                    pixel_values, (*pixel_values.shape[:-1], 3)
                )
            pixel_values = normalize_pixels(pixel_values, image_mean, image_std, dtype)
        out = compute_logits(
            params, cfg, pixel_values, input_ids, attention_mask, dtype=dtype
        )
        return out["logits"], out["similarity_scores"]

    img = cfg.vision.img_size
    in_dtype = jnp.uint8 if from_uint8 else dtype
    in_ch = channels if from_uint8 else 3
    args = (
        jax.ShapeDtypeStruct((batch_size, img, img, in_ch), in_dtype),
        jax.ShapeDtypeStruct((n_prompts, max_tokens), jnp.int32),
        jax.ShapeDtypeStruct((n_prompts, max_tokens), jnp.int32),
    )
    exported = jexport.export(jax.jit(fn))(*args)
    with open(os.path.join(out_dir, "zero_shot.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, "bundle.json"), "w") as f:
        json.dump(
            {
                "batch_size": batch_size,
                "n_prompts": n_prompts,
                "max_tokens": max_tokens,
                "img_size": img,
                "dtype": str(np.dtype(dtype).name) if dtype != jnp.bfloat16 else "bfloat16",
                "from_uint8": from_uint8,
                "channels": in_ch,
            },
            f,
            indent=2,
        )
    return out_dir


def load_zero_shot(bundle_dir: str) -> Tuple[Callable, dict]:
    """-> (runner(pixel_values, input_ids, attention_mask), bundle meta)."""
    with open(os.path.join(bundle_dir, "zero_shot.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(bundle_dir, "bundle.json")) as f:
        meta = json.load(f)

    def runner(pixel_values, input_ids, attention_mask):
        return exported.call(pixel_values, input_ids, attention_mask)

    return runner, meta

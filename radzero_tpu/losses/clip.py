"""Global-batch CLIP / SigLIP auxiliary losses.

Rebuild of the reference's ``OpenClipLoss`` / ``OpenSigLipLoss``
wrappers (exp/cxr_pt/model/losses.py:10-30), which add learnable
logit scale (and bias for SigLIP) on top of open_clip's gathered
contrastive losses. Under the pjit global view the features arrive as
full global-batch arrays, so the loss is the textbook formulation —
XLA supplies the cross-device gathers from the sharding annotations.

CLIP:   symmetric InfoNCE over ``scale * img @ txt.T`` with diagonal
        labels (open_clip ClipLoss with local_loss=False semantics).
SigLIP: pairwise log-sigmoid loss, positives on the diagonal
        (arXiv:2303.15343; init scale log(10), bias -10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_clip_loss(init_logit_scale: float = float(np.log(1 / 0.07))) -> dict:
    return {"log_logit_scale": jnp.asarray([init_logit_scale], jnp.float32)}


def clip_loss(params: dict, image_features: jnp.ndarray, text_features: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE; features are l2-normalised (B, D) global arrays."""
    scale = jnp.exp(params["log_logit_scale"][0])
    logits = scale * image_features @ text_features.T  # (B, B)
    labels = jnp.arange(logits.shape[0])
    li = -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[labels, labels])
    lt = -jnp.mean(jax.nn.log_softmax(logits.T, axis=-1)[labels, labels])
    return (li + lt) / 2.0


def init_siglip_loss(
    init_logit_scale: float = float(np.log(10.0)), init_logit_bias: float = -10.0
) -> dict:
    return {
        "log_logit_scale": jnp.asarray([init_logit_scale], jnp.float32),
        "logit_bias": jnp.asarray([init_logit_bias], jnp.float32),
    }


def siglip_loss(params: dict, image_features: jnp.ndarray, text_features: jnp.ndarray) -> jnp.ndarray:
    scale = jnp.exp(params["log_logit_scale"][0])
    bias = params["logit_bias"][0]
    logits = scale * image_features @ text_features.T + bias  # (B, B)
    b = logits.shape[0]
    signs = 2.0 * jnp.eye(b, dtype=logits.dtype) - 1.0  # +1 diagonal, -1 off-diagonal
    loss = -jax.nn.log_sigmoid(signs * logits)
    return jnp.sum(loss) / b

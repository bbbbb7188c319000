"""Optimizer construction and finetune policy.

Mirrors the reference recipe (config.yaml:1-27, radzero.yaml:1-8 via HF
TrainingArguments): AdamW (b1=0.9, b2=0.999, eps=1e-8), cosine schedule
with linear warmup, global-norm gradient clipping, and HF Trainer's
weight-decay exclusion (no decay on biases and LayerNorm parameters).

The finetune policy ``module_to_update`` (ref model/__init__.py:58-79)
is realised by *partitioning* the param pytree at the top level into
(trainable, frozen): the loss is differentiated w.r.t. the trainable
subtree only, so XLA prunes the frozen vision tower's backward pass
entirely — cheaper than masked zero-updates.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import optax

_LN_KEYS = {"ln", "ln1", "ln2", "ln_attn", "ln_out", "layer_norm", "final_ln"}


def partition_params(params: dict, module_to_update: Sequence[str]) -> Tuple[dict, dict]:
    """Split the top-level param tree into (trainable, frozen)."""
    trainable = {k: v for k, v in params.items() if k in set(module_to_update)}
    frozen = {k: v for k, v in params.items() if k not in set(module_to_update)}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    return {**trainable, **frozen}


def decay_mask(params: dict) -> dict:
    """HF Trainer semantics: decay everything except biases and LayerNorms."""

    def walk(tree, in_ln=False):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, in_ln or k in _LN_KEYS)
            else:
                out[k] = not (in_ln or k == "bias")
        return out

    return walk(params)


def warmup_cosine_schedule(
    learning_rate: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """Linear warmup then cosine decay to 0 (HF lr_scheduler_type=cosine)."""
    warmup_steps = max(warmup_steps, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.cosine_decay_schedule(learning_rate, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


def build_optimizer(
    trainable_params: dict,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.05,
    max_grad_norm: float = 1.0,
    warmup_steps: int = 50,
    total_steps: int = 10000,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    gradient_accumulation_steps: int = 1,
    bf16_moments: bool = False,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """``bf16_moments``: store Adam's first moment in bfloat16 (optax
    ``mu_dtype``) — 25% optimizer-state HBM saved with negligible update
    error; the variance stays fp32 (bf16's 8 mantissa bits are too
    coarse for v's dynamic range)."""
    import jax.numpy as jnp

    schedule = warmup_cosine_schedule(learning_rate, warmup_steps, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            schedule,
            b1=b1,
            b2=b2,
            eps=eps,
            weight_decay=weight_decay,
            mask=decay_mask(trainable_params),
            mu_dtype=jnp.bfloat16 if bf16_moments else None,
        ),
    )
    if gradient_accumulation_steps > 1:
        # HF-equivalent accumulation (config.yaml:5): each micro-batch
        # computes its own contrastive loss; gradients average over k
        # micro-steps before one optimizer update
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx, schedule

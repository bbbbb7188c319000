"""Jitted global-view train/eval steps.

Replaces the hot loop of the reference's HF-Trainer fork
(common/trainer.py:691-843: training_step -> compute_loss ->
accelerator.backward -> clip -> optimizer.step) with one compiled
function: forward + backward + clip + AdamW update fused by XLA, run
under a sharded-in global batch so the contrastive all-gathers and the
gradient reductions are derived by the SPMD partitioner
(SURVEY.md §2.3 DP row).

Multi-loss telemetry: every sub-loss is returned per step as a dict —
the trainer fork's main customisation (common/trainer.py:361-364,
952-995). In the global view the values are already global means; no
cross-process gather/average is needed.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from radzero_tpu.models.configuration import RadZeroConfig
from radzero_tpu.models.radzero import forward_train
from radzero_tpu.train.optim import merge_params


def make_train_step(
    cfg: RadZeroConfig,
    optimizer: optax.GradientTransformation,
    *,
    loss_ratio: Optional[Dict[str, float]] = None,
    dtype=jnp.bfloat16,
    remat: bool = False,
    donate: bool = True,
    stop_vision_gradient: Optional[bool] = None,
    mesh=None,
) -> Callable:
    """Build ``train_step(trainable, frozen, opt_state, batch) ->
    (trainable, opt_state, losses)``; jit with donated carry.

    ``stop_vision_gradient=None`` resolves at call time: when the vision
    tower sits in the frozen subtree, the tape is cut above it so
    autodiff stores no tower residuals (the reference freezes the tower,
    radzero.yaml:50)."""

    def loss_fn(trainable, frozen, batch):
        params = merge_params(trainable, frozen)
        stop = stop_vision_gradient
        if stop is None:
            stop = "vision_model" not in trainable
        out = forward_train(
            params, cfg, batch, loss_ratio=loss_ratio, dtype=dtype, remat=remat,
            stop_vision_gradient=stop, mesh=mesh,
        )
        losses = out["losses"]
        return losses["loss"], losses

    def train_step(trainable, frozen, opt_state, batch):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        grad_norm = optax.global_norm(grads)
        losses = dict(losses)
        losses["grad_norm"] = grad_norm
        return trainable, opt_state, losses

    return jax.jit(train_step, donate_argnums=(0, 2) if donate else ())


def make_eval_step(
    cfg: RadZeroConfig,
    *,
    loss_ratio: Optional[Dict[str, float]] = None,
    dtype=jnp.bfloat16,
) -> Callable:
    """Evaluation loss step (ref common/trainer.py prediction_step carrying
    the per-loss dict, :1017-1494)."""

    def eval_step(params, batch):
        out = forward_train(params, cfg, batch, loss_ratio=loss_ratio, dtype=dtype)
        return out["losses"]

    return jax.jit(eval_step)

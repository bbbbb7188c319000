"""Fused Pallas VL-CABS kernel.

One kernel per image computes the whole SimilarityLogit pipeline
(losses.py:187-240) without round-tripping intermediates through HBM:

    tn     = rownorm(tokens_b)                  (VPU, fp32 accum)
    s      = qn @ tn^T / tau                    (MXU, fp32)
    e      = exp2(s * log2 e)                   (|s| <= 1/tau: no max pass)
    agg    = e @ tn                             (MXU; softmax denominator
                                                 cancels in the cosine)
    logits = (qn . agg) / |agg|                 (qn pre-normalised)

Outputs both the logit column and the raw pre-softmax score map — the
dual contract every zero-shot task consumes (modeling.py:278-328).
cos sim_op only (the flagship config, radzero.yaml:46); callers fall
back to the jnp path for 'dot' or when differentiating (training).

Grid (B,): queries are revisited (loaded once), tokens stream per image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_LOG2E = 1.4426950408889634


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _kernel(tau_ref, q_ref, t_ref, scores_ref, logits_ref, *, l_real: int):
    qn = q_ref[...]          # (N_pad, D) pre-normalised queries
    t = t_ref[0]             # (L_pad, D)

    t32 = t.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True) + 1e-24)
    tn = (t32 * inv).astype(t.dtype)                      # row-normalised tokens

    inv_tau = 1.0 / tau_ref[0, 0]
    s = jax.lax.dot_general(
        qn, tn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * inv_tau                                           # (N_pad, L_pad)

    l_pad = t.shape[0]
    if l_real < l_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_real, s, -jnp.inf)

    scores_ref[0] = s

    e = jnp.exp2(s * _LOG2E)                              # bounded: |s| <= 1/tau
    agg = jnp.dot(e.astype(t.dtype), tn, preferred_element_type=jnp.float32)
    # cosine against the (unnormalised) aggregate: softmax denom cancels
    num = jnp.sum(qn.astype(jnp.float32) * agg, axis=-1)
    norm = jnp.sqrt(jnp.sum(agg * agg, axis=-1))
    logits = (num / jnp.maximum(norm, 1e-12)).astype(logits_ref.dtype)
    # sublane-aligned (1, 8, N_pad) block; caller keeps row 0
    logits_ref[0] = jnp.broadcast_to(logits[None, :], logits_ref.shape[1:])


def vlcabs_fused(
    queries_normed: jnp.ndarray,  # (N, D), l2-normalised
    tokens: jnp.ndarray,          # (B, L, D)
    tau: jnp.ndarray,             # scalar temperature
):
    """-> (logits (N, B) fp32, scores (B, N, L) fp32)."""
    n, d = queries_normed.shape
    b, l, _ = tokens.shape
    sub = 16 if queries_normed.dtype == jnp.bfloat16 else 8
    n_pad = _pad_to(max(n, sub), sub)
    l_pad = _pad_to(l, _LANE)

    q = queries_normed
    if n_pad != n:
        q = jnp.pad(q, ((0, n_pad - n), (0, 0)))
    t = tokens
    if l_pad != l:
        t = jnp.pad(t, ((0, 0), (0, l_pad - l), (0, 0)))

    tau_arr = jnp.reshape(tau.astype(jnp.float32), (1, 1))

    scores, logits = pl.pallas_call(
        functools.partial(_kernel, l_real=l),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, l_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_pad, l_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * l_pad * d,
            bytes_accessed=(b * l_pad * d + n_pad * d) * tokens.dtype.itemsize
            + b * n_pad * l_pad * 4,
            transcendentals=b * n_pad * l_pad,
        ),
    )(tau_arr, q, t)

    return logits[:, 0, :n].T, scores[:, :n, :l]

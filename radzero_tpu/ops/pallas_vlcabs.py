"""Fused Pallas VL-CABS kernels.

One kernel per image computes the whole SimilarityLogit pipeline
(losses.py:187-240) without round-tripping intermediates through HBM:

    tn     = rownorm(tokens_b)                  (VPU, fp32 accum)
    s      = qn @ tn^T / tau                    (MXU, fp32)
    e      = exp(s - rowmax(s))                 (safe at any learned tau:
                                                 the logit is 0-homogeneous
                                                 in the aggregate, so the
                                                 max shift cancels exactly)
    agg    = e @ tn                             (MXU; softmax denominator
                                                 cancels in the cosine)
    logits = (qn . agg) / |agg|                 (qn pre-normalised)

Two entry points:

- :func:`vlcabs_fused` (forward-only, serving): outputs both the logit
  column and the raw pre-softmax score map — the dual contract every
  zero-shot task consumes (modeling.py:278-328).
- :func:`vlcabs_fused_train` (differentiable, training): logits only,
  with a custom VJP whose backward RECOMPUTES the (N, L) score block in
  VMEM per image — the (B, S, L) score tensor never exists in HBM in
  either pass (the jnp autodiff path materialises it twice: ~0.7 GB per
  step at the flagship global batch).

cos sim_op only (the flagship config, radzero.yaml:46); callers fall
back to the jnp path for 'dot'.

Grid (B,): queries are revisited (loaded once), tokens stream per image.
Backward accumulates dq across sequential grid steps (same output block
every iteration — legal on TPU's sequential grid) and emits per-image dt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_LOG2E = 1.4426950408889634

# Mosaic's default scoped-VMEM budget is 16 MB; the serving kernel's
# working set (fp32 token block + rownorm copy + score block at the
# flagship 1369-token/768-d shapes) sits right at that edge. v5e/v6e
# have 128 MB VMEM per core — give the kernels proper headroom.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)



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

    # Row-max shift before exp: tau is learned and unclamped, so |s| can
    # exceed the fp32 exp range (tau < ~0.0114 overflows). The shift is
    # exact — scaling e rowwise scales agg rowwise and the cosine below
    # is scale-invariant.
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * _LOG2E)
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
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * l_pad * d,
            bytes_accessed=(b * l_pad * d + n_pad * d) * tokens.dtype.itemsize
            + b * n_pad * l_pad * 4,
            transcendentals=b * n_pad * l_pad,
        ),
    )(tau_arr, q, t)

    return logits[:, 0, :n].T, scores[:, :n, :l]


# ---------------------------------------------------------------------------
# Differentiable (training) variant: logits only, custom VJP
# ---------------------------------------------------------------------------

def _kernel_fwd_logits(tau_ref, q_ref, t_ref, logits_ref, *, l_real: int):
    """Forward without the score-map output (training never consumes it)."""
    qn = q_ref[...]
    t = t_ref[0]

    t32 = t.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True) + 1e-24)
    tn = (t32 * inv).astype(t.dtype)

    inv_tau = 1.0 / tau_ref[0, 0]
    s = jax.lax.dot_general(
        qn, tn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * inv_tau

    l_pad = t.shape[0]
    if l_real < l_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_real, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)    # overflow-safe at any tau
    e = jnp.exp2((s - m) * _LOG2E)
    agg = jnp.dot(e.astype(t.dtype), tn, preferred_element_type=jnp.float32)
    num = jnp.sum(qn.astype(jnp.float32) * agg, axis=-1)
    norm = jnp.sqrt(jnp.sum(agg * agg, axis=-1))
    logits = (num / jnp.maximum(norm, 1e-12)).astype(logits_ref.dtype)
    logits_ref[0] = jnp.broadcast_to(logits[None, :], logits_ref.shape[1:])


def _bwd_common(tau_ref, q_ref, t_ref, dz_ref, *, l_real: int):
    """Shared recompute for both backward kernels, for ONE query block
    against ONE image. With unnormalised aggregation g = e @ tn (the
    softmax denominator cancels in the cosine):

        z  = (qn.g)/|g|
        dg = dz (qn - z ghat)/|g|
        de = dg tn^T;  ds = de*e;  dc = ds/tau

    Each query row's chain touches only its own (L,) score row, so
    blocking over N is exact, and the row-normalise VJP
    dt = (dtn - (dtn.tn)tn)/|t| is LINEAR in dtn, so per-block dt
    contributions can be accumulated directly."""
    qn = q_ref[...].astype(jnp.float32)           # (block_n, D)
    t = t_ref[0]
    dz = dz_ref[0].astype(jnp.float32)            # (8, block_n); row 0 real

    t32 = t.astype(jnp.float32)
    inv_t = jax.lax.rsqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True) + 1e-24)
    tn = (t32 * inv_t).astype(t.dtype)            # (L_pad, D) compute dtype

    tau = tau_ref[0, 0]
    inv_tau = 1.0 / tau
    s = jax.lax.dot_general(
        qn.astype(t.dtype), tn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_tau                                   # (block_n, L_pad)
    l_pad = t.shape[0]
    masked = l_real < l_pad
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_real, s, -jnp.inf)
    # exp(s - rowmax): overflow-safe at any tau. All gradient formulas
    # below are unchanged — z is 0-homogeneous in g, so dg.g == 0 and the
    # rowmax's own derivative term vanishes identically; every use of e
    # (ds = de*e, dtn += e^T dg) is consistent under the rowwise rescale
    # because dg picks up the inverse factor through norm.
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * _LOG2E)                # 0 at masked cols

    g = jnp.dot(e.astype(t.dtype), tn, preferred_element_type=jnp.float32)
    norm = jnp.maximum(jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True)), 1e-12)
    ghat = g / norm
    z = jnp.sum(qn * ghat, axis=-1, keepdims=True)

    dzc = dz[0][:, None]                          # (block_n, 1)
    dg = dzc * (qn - z * ghat) / norm             # (block_n, D) fp32
    de = jax.lax.dot_general(
        dg.astype(t.dtype), tn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # (block_n, L_pad)
    ds = de * e                                   # 0 at masked cols
    dc = ds * inv_tau
    return qn, tn, inv_t, inv_tau, s, e, dzc, dg, ghat, dc, masked


def _kernel_bwd_dq(tau_ref, q_ref, t_ref, dz_ref, dq_ref, dtau_ref,
                   *, l_real: int):
    """Grid (n_blocks, B) — B innermost: dq block j accumulates over
    consecutive image steps; dtau over every step."""
    j, i = pl.program_id(0), pl.program_id(1)
    qn, tn, _, inv_tau, s, e, dzc, dg, ghat, dc, masked = _bwd_common(
        tau_ref, q_ref, t_ref, dz_ref, l_real=l_real
    )
    # s = c/tau -> dtau = -sum(ds*c)/tau^2 = -sum(ds*s)/tau = -sum(dc*s)
    # (dc = ds/tau). Per-row sum(dc) == 0 exactly (dg.g == 0), so any
    # per-row constant can be subtracted from s; using s - rowmax keeps
    # the sum well-conditioned at tiny tau (|s| can reach ~1/tau, and
    # dc is concentrated where s ~ rowmax). Masked cols have dc == 0 but
    # s == -inf: zero them.
    s_shift = s - jnp.max(s, axis=-1, keepdims=True)
    if masked:
        s_shift = jnp.where(jnp.isfinite(s), s_shift, 0.0)
    dtau = -jnp.sum(dc * s_shift)

    dqn = (
        jnp.dot(dc.astype(tn.dtype), tn, preferred_element_type=jnp.float32)
        + dzc * ghat
    )

    @pl.when(i == 0)
    def _init_dq():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_dtau():
        dtau_ref[0, 0] = 0.0

    dq_ref[...] += dqn.astype(dq_ref.dtype)
    dtau_ref[0, 0] += dtau


def _kernel_bwd_dtn(tau_ref, q_ref, t_ref, dz_ref, dtn_ref, *, l_real: int):
    """Grid (B, n_blocks) — n innermost: accumulates d(normalised tokens)
    per image across query blocks. The row-normalise VJP
    dt = (dtn - (dtn.tn)tn)/|t| is applied OUTSIDE the kernel (one fused
    XLA elementwise pass) to keep the per-program VMEM footprint inside
    the 16 MB budget — the fp32 (L, D) projection temporaries don't fit
    next to the recompute blocks."""
    j = pl.program_id(1)
    qn, tn, _, _, _, e, _, dg, _, dc, _ = _bwd_common(
        tau_ref, q_ref, t_ref, dz_ref, l_real=l_real
    )
    dtn = (
        jax.lax.dot_general(dc.astype(tn.dtype), qn.astype(tn.dtype),
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(e.astype(tn.dtype), dg.astype(tn.dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )                                             # (L_pad, D)

    @pl.when(j == 0)
    def _init():
        dtn_ref[0] = jnp.zeros_like(dtn_ref[0])

    dtn_ref[0] += dtn.astype(dtn_ref.dtype)


def _train_forward(queries_normed, tokens, tau):
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

    logits = pl.pallas_call(
        functools.partial(_kernel_fwd_logits, l_real=l),
        out_shape=jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * l_pad * d,
            bytes_accessed=(b * l_pad * d + n_pad * d) * tokens.dtype.itemsize
            + b * n_pad * 4,
            transcendentals=b * n_pad * l_pad,
        ),
    )(tau_arr, q, t)
    return logits[:, 0, :n].T  # (N, B)


@jax.custom_vjp
def vlcabs_fused_train(queries_normed, tokens, tau):
    """Differentiable fused VL-CABS: -> logits (N, B) fp32.

    The (B, N, L) score tensor never touches HBM: the forward keeps it
    in VMEM; the backward recomputes it per image (flash-attention-style
    rematerialisation, SURVEY.md §7 hard part #5)."""
    return _train_forward(queries_normed, tokens, tau)


def _train_fwd(queries_normed, tokens, tau):
    return _train_forward(queries_normed, tokens, tau), (queries_normed, tokens, tau)


_BLOCK_N = 128  # keeps each backward program's VMEM footprint ~10 MB


def _train_bwd(residuals, g):
    qn, tokens, tau = residuals
    n, d = qn.shape
    b, l, _ = tokens.shape
    sub = 16 if qn.dtype == jnp.bfloat16 else 8
    block_n = min(_pad_to(max(n, sub), sub), _BLOCK_N)
    n_pad = _pad_to(max(n, sub), block_n)
    n_blocks = n_pad // block_n
    l_pad = _pad_to(l, _LANE)

    q = qn
    if n_pad != n:
        q = jnp.pad(q, ((0, n_pad - n), (0, 0)))
    t = tokens
    if l_pad != l:
        t = jnp.pad(t, ((0, 0), (0, l_pad - l), (0, 0)))
    tau_arr = jnp.reshape(tau.astype(jnp.float32), (1, 1))

    # cotangent (N, B) -> sublane-aligned (B, 8, N_pad), row 0 real;
    # padded query rows carry zero cotangent, so their (nonzero) forward
    # garbage contributes nothing to any gradient
    dz = jnp.zeros((b, 8, n_pad), jnp.float32).at[:, 0, :n].set(
        g.astype(jnp.float32).T
    )

    interpret = jax.default_backend() == "cpu"
    common_cost = pl.CostEstimate(
        flops=8 * b * n_pad * l_pad * d,
        bytes_accessed=(b * l_pad * d + n_pad * d) * tokens.dtype.itemsize,
        transcendentals=b * n_pad * l_pad,
    )

    dq, dtau = pl.pallas_call(
        functools.partial(_kernel_bwd_dq, l_real=l),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        grid=(n_blocks, b),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_n, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_n), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_n, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=common_cost,
    )(tau_arr, q, t, dz)

    dtn = pl.pallas_call(
        functools.partial(_kernel_bwd_dtn, l_real=l),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, d), tokens.dtype),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_n), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, l_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=common_cost,
    )(tau_arr, q, t, dz)

    # row-normalise VJP outside the kernel (fused elementwise XLA pass):
    # tn = t/|t|; dt = (dtn - (dtn.tn)tn)/|t|
    dtn = dtn[:, :l].astype(jnp.float32)
    t32 = tokens.astype(jnp.float32)
    inv_t = jax.lax.rsqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True) + 1e-24)
    tn32 = t32 * inv_t
    dt = (dtn - jnp.sum(dtn * tn32, axis=-1, keepdims=True) * tn32) * inv_t

    dq = dq[:n].astype(qn.dtype)
    dt = dt.astype(tokens.dtype)
    dtau = dtau[0, 0].astype(tau.dtype).reshape(tau.shape)
    return dq, dt, dtau


vlcabs_fused_train.defvjp(_train_fwd, _train_bwd)

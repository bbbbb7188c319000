"""Pallas TPU flash attention for the ViT towers.

Non-causal multi-head attention over ~1370 tokens (ViT-B @ 518px,
SURVEY.md §3 hot loop (a)). The XLA path materialises the per-layer
(B, H, L, L) fp32 score tensor (~5.8 GB of HBM traffic per ViT-B layer
at batch 64); this kernel keeps scores in VMEM:

- K/V for one (batch, head) fit comfortably in VMEM (1408 x 64 bf16
  = 176 KB each), so no online-softmax streaming is needed: the grid is
  (B*H, L/block_q), K/V blocks are revisited across the q dimension
  (loaded once per (b,h)), and each program computes
  softmax(q K^T * scale) V for one q block with fp32 scores.
- Sequence padding to a lane multiple is masked with -inf key columns.
- fp32 softmax matches the eager-attention semantics of the towers
  (parity tests run this kernel in interpret mode on CPU).

Differentiable via custom_vjp: the backward is its own Pallas kernel
recomputing P per (batch, head) in VMEM and applying the standard
flash-attention gradient identities
(dV = P^T dO, dP = dO V^T, dS = P*(dP - rowsum(dP*P))) — the
(B, H, L, L) probability tensor never exists in HBM in either pass.
(The earlier jnp backward materialised it twice: 2 x 5.7 GB per align
layer at the flagship batch — the training step's largest allocation.)
Backward grid is (B*H, q_blocks): dK/dV accumulate across consecutive
q-block steps; dQ blocks are written once each. Only the 2 trainable
align layers ever run it; the 12 frozen ViT layers are forward-only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _pad_len(n: int, m: int = _LANE) -> int:
    return (n + m - 1) // m * m


def _pick_block_q(l_pad: int) -> int:
    # largest divisor of l_pad that keeps fp32 scores under ~4 MB VMEM
    for cand in (1024, 704, 512, 352, 256, 128):
        if l_pad % cand == 0 and cand * l_pad * 4 <= 4 * 1024 * 1024:
            return cand
    return _LANE


_LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, l_real: int, stable: bool):
    q = q_ref[0]  # (block_q, hd)
    k = k_ref[0]  # (l_pad, hd)
    v = v_ref[0]
    # fold softmax's exp -> exp2 rescaling into the score scale
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)  # (block_q, l_pad), fp32
    l_pad = k.shape[0]
    if l_real < l_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_real, s, -jnp.inf)
    if stable:
        s = s - jnp.max(s, axis=-1, keepdims=True)
    # deferred division: normalise the (block_q, hd) output instead of the
    # (block_q, l_pad) probabilities — the denominator sum stays on the VPU
    # but the big divide pass disappears
    e = jnp.exp2(s)
    den = jnp.sum(e, axis=-1, keepdims=True)
    num = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (num / den).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    stable: Optional[bool] = None,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """(B, L, H, hd) q/k/v -> (B, L, H, hd); same contract as ops.layers.attention.

    ``stable=None`` resolves to True for fp32 inputs (exact softmax with
    max subtraction) and False for bf16 (skips the rowwise-max pass;
    safe while |scores| < ~85 — trained ViT attention logits sit far
    below that, and exp2 overflow would surface as inf/nan immediately).

    ``kv_len``: when the sequence axis is already lane-padded by the
    caller (persistent-padding towers), the number of REAL tokens; keys
    beyond it are masked and no internal pad/unpad copies happen.
    """
    return _forward(q, k, v, scale, stable, kv_len)


def _forward(q, k, v, scale, stable=None, kv_len=None):
    b, l, h, hd = q.shape
    if scale is None:
        scale = hd**-0.5
    if stable is None:
        stable = q.dtype == jnp.float32
    l_real = kv_len if kv_len is not None else l
    l_pad = _pad_len(l)
    block_q = _pick_block_q(l_pad)

    def to_bh(x):  # (B, L, H, hd) -> (B*H, L_pad, hd)
        x = x.transpose(0, 2, 1, 3).reshape(b * h, l, hd)
        if l_pad != l:
            x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        return x

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    grid = (b * h, l_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(scale), l_real=l_real, stable=stable),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l_pad * l_pad * hd,
            bytes_accessed=(3 * b * h * l_pad * hd + b * h * l_pad * hd) * q.dtype.itemsize,
            transcendentals=b * h * l_pad * l_pad,
        ),
    )(qb, kb, vb)

    out = out[:, :l].reshape(b, h, l, hd).transpose(0, 2, 1, 3)
    return out


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, l_real: int):
    """One q block vs full K/V for one (batch, head): recompute the
    normalised probabilities (exact softmax, fp32) then
    dV += P^T dO, dP = dO V^T, dS = P (dP - rowsum(dP P)) scale,
    dQ = dS K, dK += dS^T Q."""
    j = pl.program_id(1)
    q = q_ref[0]   # (block_q, hd)
    k = k_ref[0]   # (l_pad, hd)
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    l_pad = k.shape[0]
    if l_real < l_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_real, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)            # (block_q, l_pad) fp32

    pc = p.astype(v.dtype)
    dv = jax.lax.dot_general(pc, do.astype(v.dtype), (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dsc = ds.astype(q.dtype)
    dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(dsc, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk.astype(dk_ref.dtype)
    dv_ref[0] += dv.astype(dv_ref.dtype)


def _fwd(q, k, v, scale, stable, kv_len):
    return _forward(q, k, v, scale, stable, kv_len), (q, k, v)


def _unbiased_bwd(scale, stable, kv_len, residuals, g):
    q, k, v = residuals
    b, l, h, hd = q.shape
    if scale is None:
        scale = hd**-0.5
    l_real = kv_len if kv_len is not None else l
    l_pad = _pad_len(l)
    # fp32 score rows + dk/dv accumulators must co-reside: halve the block
    block_q = min(_pick_block_q(l_pad), 512)

    def to_bh(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, l, hd)
        if l_pad != l:
            x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        return x

    qb, kb, vb, dob = to_bh(q), to_bh(k), to_bh(v), to_bh(g)

    grid = (b * h, l_pad // block_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=float(scale), l_real=l_real),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, l_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b * h, l_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((b * h, l_pad, hd), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * l_pad * l_pad * hd,
            bytes_accessed=6 * b * h * l_pad * hd * q.dtype.itemsize,
            transcendentals=b * h * l_pad * l_pad,
        ),
    )(qb, kb, vb, dob)

    def from_bh(x, dtype):
        x = x[:, :l].reshape(b, h, l, hd).transpose(0, 2, 1, 3)
        return x.astype(dtype)

    return from_bh(dq, q.dtype), from_bh(dk, k.dtype), from_bh(dv, v.dtype)


flash_attention.defvjp(_fwd, _unbiased_bwd)


# ---------------------------------------------------------------------------
# Bias-capable variant (MPNet: T5-style relative-position bias shared across
# the batch + per-row key-padding mask; ref exp/cxr_pt/model/losses.py:135-147
# is the text hot loop, HF MPNetEncoder adds position_bias every layer)
# ---------------------------------------------------------------------------

def _kernel_b(q_ref, k_ref, v_ref, bias_ref, neg_ref, o_ref,
              *, scale: float, l_real: int, stable: bool):
    q = q_ref[0]          # (block_q, hd)
    k = k_ref[0]          # (l_pad, hd)
    v = v_ref[0]
    bias = bias_ref[0]    # (block_q, l_pad) fp32
    neg = neg_ref[0]      # (1, l_pad) fp32 additive key mask (0 / -big)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias + neg                                # raw scores
    s = s * _LOG2E
    l_pad = k.shape[0]
    if l_real < l_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_real, s, -jnp.inf)
    if stable:
        s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s)
    den = jnp.sum(e, axis=-1, keepdims=True)
    num = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (num / den).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_bias(
    q: jnp.ndarray,        # (B, L, H, hd)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,     # (H, L, L) additive score bias, shared across batch
    neg_mask: jnp.ndarray, # (B, L) additive key mask: 0 real / big-negative pad
    scale: Optional[float] = None,
    stable: Optional[bool] = None,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Flash attention with a batch-shared additive bias (differentiable:
    the backward kernel accumulates d(bias) over the batch in VMEM) and a
    per-row additive key-padding mask.

    ``neg_mask`` is NON-DIFFERENTIABLE by contract: it must be a
    structural padding mask (0 real / big-negative pad), never a
    function of trained values — its cotangent is pinned to zero.
    Route any learned/soft additive term through ``bias``, whose
    gradient is exact.

    softmax(q k^T * scale + bias + neg_mask) v, fp32 scores.
    """
    return _forward_b(q, k, v, bias, neg_mask, scale, stable, kv_len)


def _forward_b(q, k, v, bias, neg_mask, scale, stable=None, kv_len=None):
    b, l, h, hd = q.shape
    if scale is None:
        scale = hd**-0.5
    if stable is None:
        stable = q.dtype == jnp.float32
    l_real = kv_len if kv_len is not None else l
    l_pad = _pad_len(l)
    block_q = _pick_block_q(l_pad)

    def to_bh(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, l, hd)
        if l_pad != l:
            x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        return x

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    bias_p = bias.astype(jnp.float32)
    if l_pad != l:
        bias_p = jnp.pad(bias_p, ((0, 0), (0, l_pad - l), (0, l_pad - l)))
    neg_p = neg_mask.astype(jnp.float32)
    if l_pad != neg_p.shape[1]:
        neg_p = jnp.pad(neg_p, ((0, 0), (0, l_pad - neg_p.shape[1])))
    neg_p = neg_p[:, None, :]  # (B, 1, l_pad): TPU-tileable block shape

    grid = (b * h, l_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel_b, scale=float(scale), l_real=l_real, stable=stable),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, l_pad), lambda i, j: (i % h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_pad), lambda i, j: (i // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l_pad * l_pad * hd,
            bytes_accessed=(4 * b * h * l_pad * hd) * q.dtype.itemsize
            + h * l_pad * l_pad * 4,
            transcendentals=b * h * l_pad * l_pad,
        ),
    )(qb, kb, vb, bias_p, neg_p)

    out = out[:, :l].reshape(b, h, l, hd).transpose(0, 2, 1, 3)
    return out


def _bwd_kernel_b(q_ref, k_ref, v_ref, bias_ref, neg_ref, do_ref,
                  dq_ref, dk_ref, dv_ref, dbias_ref,
                  *, scale: float, l_real: int):
    """Grid (H, B) — batch innermost: the d(bias) block for head h
    accumulates across consecutive batch steps (legal on TPU's
    sequential grid); dq/dk/dv blocks are written once each. Requires
    the full sequence in one q block (text towers: L <= 128 after lane
    padding), so no inner q-block loop exists."""
    bi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    neg = neg_ref[0]
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias + neg
    s = s * _LOG2E
    l_pad = k.shape[0]
    if l_real < l_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_real, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    pc = p.astype(v.dtype)
    dv = jax.lax.dot_general(pc, do.astype(v.dtype), (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # d(raw scores) — bias is added unscaled, so dbias = ds0 directly
    ds0 = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsc = (ds0 * scale).astype(q.dtype)
    dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(dsc, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(bi == 0)
    def _init():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    dbias_ref[0] += ds0


def _fwd_b(q, k, v, bias, neg_mask, scale, stable, kv_len):
    return _forward_b(q, k, v, bias, neg_mask, scale, stable, kv_len), (
        q, k, v, bias, neg_mask,
    )


def _bwd_b(scale, stable, kv_len, residuals, g):
    q, k, v, bias, neg_mask = residuals
    b, l, h, hd = q.shape
    if scale is None:
        scale = hd**-0.5
    l_real = kv_len if kv_len is not None else l
    l_pad = _pad_len(l)
    if l_pad > 1024:
        # The Pallas backward holds the full sequence in one q block
        # (text towers pad to <= 128 at the reference shapes), capping
        # it at 1024 lanes. Beyond that, fall back to a jnp backward
        # that materialises the (B, H, L, L) probabilities — the same
        # HBM cost attn_impl='xla' pays — so long-text opt-in configs
        # stay trainable end to end instead of failing at the first
        # optimization step.
        qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
        s = jnp.einsum("blhd,bmhd->bhlm", qf, kf) * scale
        s = s + bias.astype(jnp.float32)[None]
        s = s + neg_mask.astype(jnp.float32)[:, None, None, :]
        if l_real < l:
            col = jnp.arange(l)
            s = jnp.where(col[None, None, None, :] < l_real, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        gf = g.astype(jnp.float32)
        dv = jnp.einsum("bhlm,blhd->bmhd", p, gf)
        dp = jnp.einsum("blhd,bmhd->bhlm", gf, vf)
        ds0 = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.einsum("bhlm,bmhd->blhd", ds0, kf) * scale
        dk = jnp.einsum("bhlm,blhd->bmhd", ds0, qf) * scale
        return (
            dq.astype(q.dtype),
            dk.astype(k.dtype),
            dv.astype(v.dtype),
            jnp.sum(ds0, axis=0).astype(bias.dtype),
            jnp.zeros_like(neg_mask),  # structural mask: see flash_attention_bias
        )

    def to_bh(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, l, hd)
        if l_pad != l:
            x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        return x

    qb, kb, vb, dob = to_bh(q), to_bh(k), to_bh(v), to_bh(g)
    bias_p = bias.astype(jnp.float32)
    if l_pad != l:
        bias_p = jnp.pad(bias_p, ((0, 0), (0, l_pad - l), (0, l_pad - l)))
    neg_p = neg_mask.astype(jnp.float32)
    if l_pad != neg_p.shape[1]:
        neg_p = jnp.pad(neg_p, ((0, 0), (0, l_pad - neg_p.shape[1])))
    neg_p = neg_p[:, None, :]  # (B, 1, l_pad): TPU-tileable block shape

    grid = (h, b)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel_b, scale=float(scale), l_real=l_real),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, l_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b * h, l_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((b * h, l_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((h, l_pad, l_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, l_pad, hd), lambda hi, bi: (bi * h + hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda hi, bi: (bi * h + hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda hi, bi: (bi * h + hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, l_pad), lambda hi, bi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_pad), lambda hi, bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda hi, bi: (bi * h + hi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, l_pad, hd), lambda hi, bi: (bi * h + hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda hi, bi: (bi * h + hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, hd), lambda hi, bi: (bi * h + hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, l_pad), lambda hi, bi: (hi, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * l_pad * l_pad * hd,
            bytes_accessed=6 * b * h * l_pad * hd * q.dtype.itemsize
            + 2 * h * l_pad * l_pad * 4,
            transcendentals=b * h * l_pad * l_pad,
        ),
    )(qb, kb, vb, bias_p, neg_p, dob)

    def from_bh(x, dtype):
        x = x[:, :l].reshape(b, h, l, hd).transpose(0, 2, 1, 3)
        return x.astype(dtype)

    return (
        from_bh(dq, q.dtype),
        from_bh(dk, k.dtype),
        from_bh(dv, v.dtype),
        dbias[:, :l, :l].astype(bias.dtype),
        # neg_mask is CONTRACTUALLY non-differentiable: it must be a
        # structural padding mask (entries 0 or -big, not a function of
        # trained values). Its cotangent is pinned to zero — exact for
        # the -big columns (zero probability); for the 0 entries the
        # true gradient (sum_{h,i} dS) is deliberately not computed.
        # A learned/soft additive mask must go through `bias` (whose
        # gradient IS exact) instead.
        jnp.zeros_like(neg_mask),
    )


flash_attention_bias.defvjp(_fwd_b, _bwd_b)

"""Fused transformer-layer Pallas kernels for the serving-path ViT.

XLA on TPU executes fusions sequentially: every LayerNorm / GELU /
residual loop-fusion occupies the core without feeding the MXU, and each
costs full activation HBM round trips. At the flagship serving shape
(batch 64 x 1408 tokens x 768, bf16) the non-matmul residue is ~25% of
layer time (tools/profile_vit.py). These kernels fold the elementwise
stages into the matmul programs so the VPU work overlaps Mosaic's
software-pipelined MXU schedule and the intermediates never touch HBM:

- :func:`fused_preattn`  : qkv = ln1(x) @ Wqkv + b        (one read of x)
- :func:`fused_postattn` : y = x + ls1*(a @ Wo + bo);
                           out = y + ls2*(gelu(ln2(y) @ W1 + b1) @ W2 + b2)

Forward-only by design — the serving path (compute_logits,
modeling.py:278-328) is where the 5x north star is measured, and 12 of
14 tower layers are frozen even in training. Training keeps the
autodiff-able unfused path.

Numerics: fp32 LayerNorm/GELU/accumulation, bf16 MXU operands — the
same contract as the unfused ops (ops/layers.py), parity-tested in
tests/test_fused_layer.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _ln(x32, scale, bias, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


_LOG2E = 1.4426950408889634


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |abs err| <= 1.5e-7.

    Mosaic has no erf primitive; this matches jax.lax.erf far below
    bf16 resolution (and below the fp32 parity tolerances in
    tests/test_fused_layer.py) using only mul/div/exp2."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp2(-(ax * ax) * _LOG2E))


def _gelu_exact(x32):
    # erf-based gelu, matching ops.layers.gelu / HF (exact erf replaced
    # by the <=1.5e-7 approximation above — see _erf_approx)
    return x32 * 0.5 * (1.0 + _erf_approx(x32 * (2.0**-0.5)))


# ---------------------------------------------------------------------------
# pre-attention: ln1 -> packed qkv projection
# ---------------------------------------------------------------------------

def _preattn_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref, *, eps):
    x32 = x_ref[...].astype(jnp.float32)
    h = _ln(x32, lns_ref[...].astype(jnp.float32), lnb_ref[...].astype(jnp.float32), eps)
    o = jnp.dot(h.astype(o_ref.dtype), w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (o + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_preattn(x, ln_scale, ln_bias, w_qkv, b_qkv, *, eps=1e-6, block_n=512):
    """(N, D) x -> (N, 3D) packed qkv = ln1(x) @ w_qkv + b_qkv.

    ``w_qkv``: (D, 3D) pre-packed [q | k | v] kernels; callers split the
    output by static slicing (cheap layout-compatible views).
    """
    n, d = x.shape
    d3 = w_qkv.shape[1]
    n_pad = (n + block_n - 1) // block_n * block_n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_preattn_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_pad, d3), x.dtype),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, d3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * d3,
            bytes_accessed=(n_pad * (d + d3) + d * d3) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, ln_scale[None, :], ln_bias[None, :], w_qkv, b_qkv[None, :])
    return out[:n]


# ---------------------------------------------------------------------------
# packed-layout attention: (B, L, 3D) -> (B, L, D), no head transposes
# ---------------------------------------------------------------------------

def _packed_attn_kernel(qkv_ref, o_ref, *, n_heads: int, hd: int,
                        scale: float, l_real: int, stable: bool,
                        round_bf16: bool):
    """One image per program; static per-head lane slices of the packed
    block replace the (B, L, H, hd) <-> (B*H, L, hd) transpose round
    trips of the generic flash path (8 full-activation HBM passes per
    layer at the serving shape)."""
    qkv = qkv_ref[0]                     # (l_pad, 3D) in VMEM
    d = n_heads * hd
    l_pad = qkv.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 1)
    for h in range(n_heads):
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        if l_real < l_pad:
            s = jnp.where(col < l_real, s, -jnp.inf)
        if stable:
            s = s - jnp.max(s, axis=-1, keepdims=True)
        if round_bf16:
            # bf16-rounded exponent argument: ~0.4% relative error on the
            # attention weights — far below the tower's bf16 noise floor
            # (scores already come from bf16 operands) — and measurably
            # cheaper on the VPU (-0.36 ms/layer at the serving shape)
            s = s.astype(jnp.bfloat16).astype(jnp.float32)
        e = jnp.exp2(s)
        den = jnp.sum(e, axis=-1, keepdims=True)
        num = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd : (h + 1) * hd] = (num / den).astype(o_ref.dtype)


def flash_attention_packed(qkv, n_heads: int, kv_len=None, scale=None,
                           stable=None, round_bf16=None):
    """(B, L_pad, 3D) packed [q | k | v] -> (B, L_pad, D) merged heads.

    Forward-only serving variant of ops.flash_attention with the same
    softmax semantics (fp32 scores, masked lane padding via ``kv_len``,
    optional row-max stabilisation resolved by dtype).
    ``round_bf16=None`` resolves by dtype (bf16 inputs round the
    exponent argument — the serving default); the differentiable
    wrapper below passes False so forward and backward agree exactly.
    """
    b, l_pad, d3 = qkv.shape
    d = d3 // 3
    hd = d // n_heads
    if scale is None:
        scale = hd**-0.5
    if stable is None:
        stable = qkv.dtype == jnp.float32
    if round_bf16 is None:
        round_bf16 = qkv.dtype == jnp.bfloat16
    l_real = kv_len if kv_len is not None else l_pad

    return pl.pallas_call(
        functools.partial(
            _packed_attn_kernel, n_heads=n_heads, hd=hd,
            scale=float(scale), l_real=l_real, stable=stable,
            round_bf16=round_bf16,
        ),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, d), qkv.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l_pad, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * l_pad * l_pad * hd,
            bytes_accessed=b * l_pad * (d3 + d) * qkv.dtype.itemsize,
            transcendentals=b * n_heads * l_pad * l_pad,
        ),
    )(qkv)


# ---------------------------------------------------------------------------
# differentiable packed-layout attention (training path for the trainable
# align layers: same transpose-free layout as the serving kernel, with a
# Pallas backward that emits the packed d(qkv) directly)
# ---------------------------------------------------------------------------

def _packed_attn_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, n_heads: int,
                            hd: int, scale: float, l_real: int):
    """One image per program: recompute the exact fp32 softmax per head
    (flash-style — the (L, L) probabilities never touch HBM), then
    dV = P^T dO, dP = dO V^T, dS = P (dP - rowsum(dP P)) scale,
    dQ = dS K, dK = dS^T Q, written to static per-head lane slices of
    the packed (L_pad, 3D) gradient block. Padded key columns get P = 0
    (masked to -inf before exp), so every gradient contribution through
    them vanishes; padded query rows receive dO = 0 from the caller's
    slice, zeroing their dq/dk/dv terms."""
    qkv = qkv_ref[0]                     # (l_pad, 3D) in VMEM
    do_all = do_ref[0]                   # (l_pad, D)
    d = n_heads * hd
    l_pad = qkv.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 1)
    for h in range(n_heads):
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        do = do_all[:, h * hd : (h + 1) * hd].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        if l_real < l_pad:
            s = jnp.where(col < l_real, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)       # (l_pad, l_pad) fp32

        pc = p.astype(v.dtype)
        doc = do.astype(v.dtype)
        dv = jax.lax.dot_general(pc, doc, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(doc, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dsc = ds.astype(q.dtype)
        dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsc, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

        dqkv_ref[0, :, h * hd : (h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, d + h * hd : d + (h + 1) * hd] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * d + h * hd : 2 * d + (h + 1) * hd] = dv.astype(
            dqkv_ref.dtype
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def flash_attention_packed_vjp(qkv, n_heads: int, kv_len=None, scale=None):
    """Differentiable :func:`flash_attention_packed`: (B, L_pad, 3D)
    packed qkv -> (B, L_pad, D), custom VJP in the same packed layout.

    Eliminates the (B, L, H, hd) <-> (B*H, L_pad, hd) transpose round
    trips that ops.flash_attention pays in BOTH passes (plus once more
    under remat) — the training analog of the serving layout win.
    Numerics: exact fp32 softmax with row-max shift in forward and
    backward (no bf16 exponent rounding, so the recomputed backward
    probabilities match the forward bit-for-bit)."""
    return flash_attention_packed(
        qkv, n_heads, kv_len=kv_len, scale=scale, stable=True,
        round_bf16=False,
    )


def _packed_vjp_fwd(qkv, n_heads, kv_len, scale):
    return flash_attention_packed_vjp(qkv, n_heads, kv_len, scale), qkv


def _packed_vjp_bwd(n_heads, kv_len, scale, qkv, g):
    b, l_pad, d3 = qkv.shape
    d = d3 // 3
    hd = d // n_heads
    if scale is None:
        scale = hd**-0.5
    l_real = kv_len if kv_len is not None else l_pad

    dqkv = pl.pallas_call(
        functools.partial(
            _packed_attn_bwd_kernel, n_heads=n_heads, hd=hd,
            scale=float(scale), l_real=l_real,
        ),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, d3), qkv.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l_pad, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l_pad, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n_heads * l_pad * l_pad * hd,
            bytes_accessed=2 * b * l_pad * (d3 + d) * qkv.dtype.itemsize,
            transcendentals=b * n_heads * l_pad * l_pad,
        ),
    )(qkv, g)
    return (dqkv,)


flash_attention_packed_vjp.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


# ---------------------------------------------------------------------------
# post-attention: proj + residual + ln2 + mlp + residual
# ---------------------------------------------------------------------------

def _postattn_kernel(x_ref, a_ref, wo_ref, bo_ref, ls1_ref,
                     lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     ls2_ref, o_ref, *, eps):
    a = a_ref[...]
    proj = jnp.dot(a, wo_ref[...], preferred_element_type=jnp.float32)
    proj = proj + bo_ref[...].astype(jnp.float32)
    y32 = x_ref[...].astype(jnp.float32) + ls1_ref[...].astype(jnp.float32) * proj

    h = _ln(y32, lns_ref[...].astype(jnp.float32), lnb_ref[...].astype(jnp.float32), eps)
    h = jnp.dot(h.astype(a.dtype), w1_ref[...], preferred_element_type=jnp.float32)
    h = _gelu_exact(h + b1_ref[...].astype(jnp.float32))
    m = jnp.dot(h.astype(a.dtype), w2_ref[...], preferred_element_type=jnp.float32)
    m = m + b2_ref[...].astype(jnp.float32)

    o_ref[...] = (y32 + ls2_ref[...].astype(jnp.float32) * m).astype(o_ref.dtype)


def fused_postattn(x, attn_out, wo, bo, ls1, ln_scale, ln_bias,
                   w1, b1, w2, b2, ls2, *, eps=1e-6, block_n=256):
    """(N, D) residual stream x + merged-head attention output ->
    next residual stream, entirely in VMEM:

        y   = x + ls1 * (attn_out @ wo + bo)
        out = y + ls2 * (gelu(ln2(y) @ w1 + b1) @ w2 + b2)
    """
    n, d = x.shape
    f = w1.shape[1]
    n_pad = (n + block_n - 1) // block_n * block_n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        attn_out = jnp.pad(attn_out, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_postattn_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * (d + 2 * f),
            bytes_accessed=(3 * n_pad * d + d * d + 2 * d * f) * x.dtype.itemsize,
            transcendentals=n_pad * f,
        ),
    )(
        x, attn_out, wo, bo[None, :], ls1[None, :], ln_scale[None, :],
        ln_bias[None, :], w1, b1[None, :], w2, b2[None, :], ls2[None, :],
    )
    return out[:n]

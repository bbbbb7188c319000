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
# differentiable pre-attention: custom VJP for ln1 -> packed qkv
# (training path for the trainable align layers — same fused forward as
# the serving kernel, with a Pallas backward that recomputes the LN from
# the block input and accumulates the weight gradients across the grid)
# ---------------------------------------------------------------------------

def _preattn_bwd_kernel(x_ref, lns_ref, lnb_ref, w_ref, g_ref,
                        dx_ref, dw_ref, db_ref, dls_ref, dlb_ref, *, eps):
    """One row block per program. Recomputes ln1(x) (cheap, VPU) so the
    (N, D) normalised activations never persist in HBM; the weight/LN
    gradients accumulate into grid-constant fp32 output blocks (TPU grid
    programs run sequentially on a core, so += across programs is safe).
    Zero cotangent rows (sequence lane padding) contribute zero to every
    accumulated gradient — all terms are multiplicative in g."""
    i = pl.program_id(0)
    x32 = x_ref[...].astype(jnp.float32)
    scale = lns_ref[...].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xn = xc * rstd
    h = xn * scale + lnb_ref[...].astype(jnp.float32)

    g = g_ref[...]
    # dh = g @ w^T ; contraction over the packed 3D axis
    dh = jax.lax.dot_general(
        g, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw = jax.lax.dot_general(
        h.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    dls = jnp.sum(dh * xn, axis=0, keepdims=True)
    dlb = jnp.sum(dh, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)
        dls_ref[...] = jnp.zeros(dls_ref.shape, dls_ref.dtype)
        dlb_ref[...] = jnp.zeros(dlb_ref.shape, dlb_ref.dtype)

    dw_ref[...] += dw
    db_ref[...] += db
    dls_ref[...] += dls
    dlb_ref[...] += dlb

    # LayerNorm input gradient
    dxn = dh * scale
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dxn - m1 - xn * m2)).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_preattn_vjp(x, ln_scale, ln_bias, w_qkv, b_qkv, eps=1e-6):
    """Differentiable :func:`fused_preattn`. Callers pass operands in the
    compute dtype (the packed-path convention — weight casts happen
    outside, so gradients flow back through the astype like the unfused
    ``ops.layers.linear`` path)."""
    return fused_preattn(x, ln_scale, ln_bias, w_qkv, b_qkv, eps=eps)


def _preattn_vjp_fwd(x, ln_scale, ln_bias, w_qkv, b_qkv, eps):
    out = fused_preattn(x, ln_scale, ln_bias, w_qkv, b_qkv, eps=eps)
    # b_qkv rides along only so the bwd can emit its cotangent in the
    # right dtype when b_qkv and w_qkv differ (mixed-precision callers)
    return out, (x, ln_scale, ln_bias, w_qkv, b_qkv)


def _preattn_vjp_bwd(eps, res, g, *, block_n=512):
    x, ln_scale, ln_bias, w_qkv, b_qkv = res
    n, d = x.shape
    d3 = w_qkv.shape[1]
    n_pad = (n + block_n - 1) // block_n * block_n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))

    dx, dw, db, dls, dlb = pl.pallas_call(
        functools.partial(_preattn_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((d, d3), jnp.float32),
            jax.ShapeDtypeStruct((1, d3), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * d * d3,
            bytes_accessed=(n_pad * (2 * d + d3) + 2 * d * d3) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, ln_scale[None, :], ln_bias[None, :], w_qkv, g)
    return (
        dx[:n],
        dls[0].astype(ln_scale.dtype),
        dlb[0].astype(ln_bias.dtype),
        dw.astype(w_qkv.dtype),
        db[0].astype(b_qkv.dtype),
    )


fused_preattn_vjp.defvjp(_preattn_vjp_fwd, _preattn_vjp_bwd)


# ---------------------------------------------------------------------------
# differentiable post-attention: custom VJP for
# proj + residual + ln2 + mlp + residual
# ---------------------------------------------------------------------------

_INV_SQRT_2PI = 0.3989422804014327


def _postattn_bwd_kernel(x_ref, a_ref, wo_ref, bo_ref, ls1_ref, lns_ref,
                         lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls2_ref,
                         g_ref, dx_ref, da_ref, dwo_ref, dbo_ref, dls1_ref,
                         dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                         db2_ref, dls2_ref, *, eps):
    """One row block per program: recompute the block's forward chain
    (proj -> residual -> ln2 -> fc1 -> gelu -> fc2) in VMEM, then walk it
    backwards — the (N, F) GELU intermediates never exist in HBM in
    either pass. Weight/LN/LayerScale gradients accumulate into
    grid-constant fp32 blocks (sequential TPU grid)."""
    i = pl.program_id(0)
    a = a_ref[...]
    cdt = a.dtype
    ls1 = ls1_ref[...].astype(jnp.float32)
    ls2 = ls2_ref[...].astype(jnp.float32)
    lnscale = lns_ref[...].astype(jnp.float32)

    # ---- forward recompute ----
    proj = jnp.dot(a, wo_ref[...], preferred_element_type=jnp.float32)
    proj = proj + bo_ref[...].astype(jnp.float32)
    y32 = x_ref[...].astype(jnp.float32) + ls1 * proj
    mu = jnp.mean(y32, axis=-1, keepdims=True)
    yc = y32 - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    yn = yc * rstd
    hln = yn * lnscale + lnb_ref[...].astype(jnp.float32)
    hlnc = hln.astype(cdt)
    h1 = jnp.dot(hlnc, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[...].astype(jnp.float32)
    phi = 0.5 * (1.0 + _erf_approx(h1 * (2.0**-0.5)))
    gl = h1 * phi
    glc = gl.astype(cdt)
    m = jnp.dot(glc, w2_ref[...], preferred_element_type=jnp.float32)
    m = m + b2_ref[...].astype(jnp.float32)

    # ---- backward ----
    g32 = g_ref[...].astype(jnp.float32)
    dls2 = jnp.sum(g32 * m, axis=0, keepdims=True)
    dm = g32 * ls2
    dmc = dm.astype(cdt)
    dw2 = jax.lax.dot_general(glc, dmc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(dm, axis=0, keepdims=True)
    dgl = jax.lax.dot_general(dmc, w2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # gelu'(x) = Phi(x) + x * pdf(x)
    pdf = _INV_SQRT_2PI * jnp.exp2(-(h1 * h1) * (0.5 * _LOG2E))
    dh1 = dgl * (phi + h1 * pdf)
    dh1c = dh1.astype(cdt)
    dw1 = jax.lax.dot_general(hlnc, dh1c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh1, axis=0, keepdims=True)
    dhln = jax.lax.dot_general(dh1c, w1_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dlns = jnp.sum(dhln * yn, axis=0, keepdims=True)
    dlnb = jnp.sum(dhln, axis=0, keepdims=True)
    dyn = dhln * lnscale
    m1 = jnp.mean(dyn, axis=-1, keepdims=True)
    m2 = jnp.mean(dyn * yn, axis=-1, keepdims=True)
    dy = g32 + rstd * (dyn - m1 - yn * m2)
    dls1 = jnp.sum(dy * proj, axis=0, keepdims=True)
    dproj = dy * ls1
    dprojc = dproj.astype(cdt)
    da = jax.lax.dot_general(dprojc, wo_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dwo = jax.lax.dot_general(a, dprojc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbo = jnp.sum(dproj, axis=0, keepdims=True)

    dx_ref[...] = dy.astype(dx_ref.dtype)
    da_ref[...] = da.astype(da_ref.dtype)

    @pl.when(i == 0)
    def _():
        for r in (dwo_ref, dbo_ref, dls1_ref, dlns_ref, dlnb_ref,
                  dw1_ref, db1_ref, dw2_ref, db2_ref, dls2_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    dwo_ref[...] += dwo
    dbo_ref[...] += dbo
    dls1_ref[...] += dls1
    dlns_ref[...] += dlns
    dlnb_ref[...] += dlnb
    dw1_ref[...] += dw1
    db1_ref[...] += db1
    dw2_ref[...] += dw2
    db2_ref[...] += db2
    dls2_ref[...] += dls2


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def fused_postattn_vjp(x, attn_out, wo, bo, ls1, ln_scale, ln_bias,
                       w1, b1, w2, b2, ls2, eps=1e-6):
    """Differentiable :func:`fused_postattn` (same forward kernel);
    operands in compute dtype, see :func:`fused_preattn_vjp`."""
    return fused_postattn(x, attn_out, wo, bo, ls1, ln_scale, ln_bias,
                          w1, b1, w2, b2, ls2, eps=eps)


def _postattn_vjp_fwd(x, attn_out, wo, bo, ls1, ln_scale, ln_bias,
                      w1, b1, w2, b2, ls2, eps):
    out = fused_postattn(x, attn_out, wo, bo, ls1, ln_scale, ln_bias,
                         w1, b1, w2, b2, ls2, eps=eps)
    return out, (x, attn_out, wo, bo, ls1, ln_scale, ln_bias, w1, b1, w2, b2, ls2)


def _postattn_vjp_bwd(eps, res, g, *, block_n=256):
    x, attn_out, wo, bo, ls1, ln_scale, ln_bias, w1, b1, w2, b2, ls2 = res
    n, d = x.shape
    f = w1.shape[1]
    n_pad = (n + block_n - 1) // block_n * block_n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        attn_out = jnp.pad(attn_out, ((0, n_pad - n), (0, 0)))
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))

    def row():
        return pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM)

    vec_d = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_f = pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_dd = pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_df = pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_fd = pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_postattn_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d), x.dtype),       # dx
            jax.ShapeDtypeStruct((n_pad, d), x.dtype),       # da
            jax.ShapeDtypeStruct((d, d), jnp.float32),       # dwo
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dbo
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dls1
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dlns
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dlnb
            jax.ShapeDtypeStruct((d, f), jnp.float32),       # dw1
            jax.ShapeDtypeStruct((1, f), jnp.float32),       # db1
            jax.ShapeDtypeStruct((f, d), jnp.float32),       # dw2
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # db2
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dls2
        ),
        grid=(n_pad // block_n,),
        in_specs=[
            row(), row(), mat_dd, vec_d, vec_d, vec_d, vec_d,
            mat_df, vec_f, mat_fd, vec_d, vec_d, row(),
        ],
        out_specs=(
            row(), row(), mat_dd, vec_d, vec_d, vec_d, vec_d,
            mat_df, vec_f, mat_fd, vec_d, vec_d,
        ),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * (d + 2 * f) * 3,
            bytes_accessed=(5 * n_pad * d + 2 * (d * d + 2 * d * f))
            * x.dtype.itemsize,
            transcendentals=2 * n_pad * f,
        ),
    )(
        x, attn_out, wo, bo[None, :], ls1[None, :], ln_scale[None, :],
        ln_bias[None, :], w1, b1[None, :], w2, b2[None, :], ls2[None, :], g,
    )
    (dx, da, dwo, dbo, dls1, dlns, dlnb, dw1, db1, dw2, db2, dls2) = outs
    return (
        dx[:n],
        da[:n],
        dwo.astype(wo.dtype),
        dbo[0].astype(bo.dtype),
        dls1[0].astype(ls1.dtype),
        dlns[0].astype(ln_scale.dtype),
        dlnb[0].astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b2.dtype),
        dls2[0].astype(ls2.dtype),
    )


fused_postattn_vjp.defvjp(_postattn_vjp_fwd, _postattn_vjp_bwd)


# ---------------------------------------------------------------------------
# MPNet post-LN block: proj + add + LN + MLP + add + LN, differentiable
# (the text tower's whole non-attention chain — ref MPNetSelfOutput /
# MPNetIntermediate / MPNetOutput semantics, exp/cxr_pt text hot loop)
# ---------------------------------------------------------------------------

def _mpnet_post_kernel(x_ref, a_ref, wo_ref, bo_ref, lnsa_ref, lnba_ref,
                       w1_ref, b1_ref, w2_ref, b2_ref, lnso_ref, lnbo_ref,
                       o_ref, *, eps):
    a = a_ref[...]
    cdt = a.dtype
    proj = jnp.dot(a, wo_ref[...], preferred_element_type=jnp.float32)
    u = x_ref[...].astype(jnp.float32) + proj + bo_ref[...].astype(jnp.float32)
    yln = _ln(u, lnsa_ref[...].astype(jnp.float32),
              lnba_ref[...].astype(jnp.float32), eps)
    h1 = jnp.dot(yln.astype(cdt), w1_ref[...], preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[...].astype(jnp.float32)
    gl = _gelu_exact(h1)
    m = jnp.dot(gl.astype(cdt), w2_ref[...], preferred_element_type=jnp.float32)
    m = m + b2_ref[...].astype(jnp.float32)
    o = _ln(yln + m, lnso_ref[...].astype(jnp.float32),
            lnbo_ref[...].astype(jnp.float32), eps)
    o_ref[...] = o.astype(o_ref.dtype)


def _mpnet_post_bwd_kernel(x_ref, a_ref, wo_ref, bo_ref, lnsa_ref, lnba_ref,
                           w1_ref, b1_ref, w2_ref, b2_ref, lnso_ref, lnbo_ref,
                           g_ref, dx_ref, da_ref, dwo_ref, dbo_ref, dlnsa_ref,
                           dlnba_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                           dlnso_ref, dlnbo_ref, *, eps):
    """Block-wise recompute-and-backprop of the post-LN chain; weight/LN
    gradients accumulate into grid-constant fp32 blocks (sequential TPU
    grid). Mirrors :func:`_postattn_bwd_kernel` for the pre-LN layer."""
    i = pl.program_id(0)
    a = a_ref[...]
    cdt = a.dtype
    lnsa = lnsa_ref[...].astype(jnp.float32)
    lnso = lnso_ref[...].astype(jnp.float32)

    # ---- forward recompute ----
    proj = jnp.dot(a, wo_ref[...], preferred_element_type=jnp.float32)
    u = x_ref[...].astype(jnp.float32) + proj + bo_ref[...].astype(jnp.float32)
    mu1 = jnp.mean(u, axis=-1, keepdims=True)
    uc = u - mu1
    var1 = jnp.mean(uc * uc, axis=-1, keepdims=True)
    rstd1 = jax.lax.rsqrt(var1 + eps)
    un = uc * rstd1
    yln = un * lnsa + lnba_ref[...].astype(jnp.float32)
    ylnc = yln.astype(cdt)
    h1 = jnp.dot(ylnc, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[...].astype(jnp.float32)
    phi = 0.5 * (1.0 + _erf_approx(h1 * (2.0**-0.5)))
    gl = h1 * phi
    glc = gl.astype(cdt)
    m = jnp.dot(glc, w2_ref[...], preferred_element_type=jnp.float32)
    m = m + b2_ref[...].astype(jnp.float32)
    v = yln + m
    mu2 = jnp.mean(v, axis=-1, keepdims=True)
    vc = v - mu2
    var2 = jnp.mean(vc * vc, axis=-1, keepdims=True)
    rstd2 = jax.lax.rsqrt(var2 + eps)
    vn = vc * rstd2

    # ---- backward ----
    g32 = g_ref[...].astype(jnp.float32)
    dlnso = jnp.sum(g32 * vn, axis=0, keepdims=True)
    dlnbo = jnp.sum(g32, axis=0, keepdims=True)
    dvn = g32 * lnso
    m1 = jnp.mean(dvn, axis=-1, keepdims=True)
    m2 = jnp.mean(dvn * vn, axis=-1, keepdims=True)
    dv = rstd2 * (dvn - m1 - vn * m2)
    dm = dv
    dmc = dm.astype(cdt)
    dw2 = jax.lax.dot_general(glc, dmc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(dm, axis=0, keepdims=True)
    dgl = jax.lax.dot_general(dmc, w2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    pdf = _INV_SQRT_2PI * jnp.exp2(-(h1 * h1) * (0.5 * _LOG2E))
    dh1 = dgl * (phi + h1 * pdf)
    dh1c = dh1.astype(cdt)
    dw1 = jax.lax.dot_general(ylnc, dh1c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh1, axis=0, keepdims=True)
    dyln = dv + jax.lax.dot_general(dh1c, w1_ref[...], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    dlnsa = jnp.sum(dyln * un, axis=0, keepdims=True)
    dlnba = jnp.sum(dyln, axis=0, keepdims=True)
    dun = dyln * lnsa
    m3 = jnp.mean(dun, axis=-1, keepdims=True)
    m4 = jnp.mean(dun * un, axis=-1, keepdims=True)
    du = rstd1 * (dun - m3 - un * m4)
    dprojc = du.astype(cdt)
    da = jax.lax.dot_general(dprojc, wo_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dwo = jax.lax.dot_general(a, dprojc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbo = jnp.sum(du, axis=0, keepdims=True)

    dx_ref[...] = du.astype(dx_ref.dtype)
    da_ref[...] = da.astype(da_ref.dtype)

    @pl.when(i == 0)
    def _():
        for r in (dwo_ref, dbo_ref, dlnsa_ref, dlnba_ref, dw1_ref, db1_ref,
                  dw2_ref, db2_ref, dlnso_ref, dlnbo_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    dwo_ref[...] += dwo
    dbo_ref[...] += dbo
    dlnsa_ref[...] += dlnsa
    dlnba_ref[...] += dlnba
    dw1_ref[...] += dw1
    db1_ref[...] += db1
    dw2_ref[...] += dw2
    db2_ref[...] += db2
    dlnso_ref[...] += dlnso
    dlnbo_ref[...] += dlnbo


def _mpnet_post_call(x, attn_out, wo, bo, lnsa, lnba, w1, b1, w2, b2,
                     lnso, lnbo, eps, block_n=256):
    n, d = x.shape
    n_pad = (n + block_n - 1) // block_n * block_n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        attn_out = jnp.pad(attn_out, ((0, n_pad - n), (0, 0)))
    f = w1.shape[1]
    row = lambda: pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    vec_d = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_f = pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_dd = pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_df = pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_fd = pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_mpnet_post_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        grid=(n_pad // block_n,),
        in_specs=[
            row(), row(), mat_dd, vec_d, vec_d, vec_d,
            mat_df, vec_f, mat_fd, vec_d, vec_d, vec_d,
        ],
        out_specs=row(),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * (d + 2 * f),
            bytes_accessed=(3 * n_pad * d + d * d + 2 * d * f) * x.dtype.itemsize,
            transcendentals=n_pad * f,
        ),
    )(
        x, attn_out, wo, bo[None, :], lnsa[None, :], lnba[None, :],
        w1, b1[None, :], w2, b2[None, :], lnso[None, :], lnbo[None, :],
    )
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def fused_mpnet_post_vjp(x, attn_out, wo, bo, lnsa, lnba, w1, b1, w2, b2,
                         lnso, lnbo, eps=1e-12):
    """Differentiable fused MPNet post-attention chain:

        y   = LN(x + attn_out @ wo + bo)
        out = LN(y + gelu(y @ w1 + b1) @ w2 + b2)

    Operands in compute dtype (see :func:`fused_preattn_vjp`)."""
    return _mpnet_post_call(x, attn_out, wo, bo, lnsa, lnba, w1, b1, w2, b2,
                            lnso, lnbo, eps)


def _mpnet_post_vjp_fwd(x, attn_out, wo, bo, lnsa, lnba, w1, b1, w2, b2,
                        lnso, lnbo, eps):
    out = _mpnet_post_call(x, attn_out, wo, bo, lnsa, lnba, w1, b1, w2, b2,
                           lnso, lnbo, eps)
    return out, (x, attn_out, wo, bo, lnsa, lnba, w1, b1, w2, b2, lnso, lnbo)


def _mpnet_post_vjp_bwd(eps, res, g, *, block_n=256):
    x, attn_out, wo, bo, lnsa, lnba, w1, b1, w2, b2, lnso, lnbo = res
    n, d = x.shape
    f = w1.shape[1]
    n_pad = (n + block_n - 1) // block_n * block_n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        attn_out = jnp.pad(attn_out, ((0, n_pad - n), (0, 0)))
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))

    row = lambda: pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    vec_d = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_f = pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_dd = pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_df = pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_fd = pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_mpnet_post_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d), x.dtype),       # dx
            jax.ShapeDtypeStruct((n_pad, d), x.dtype),       # da
            jax.ShapeDtypeStruct((d, d), jnp.float32),       # dwo
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dbo
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dlnsa
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dlnba
            jax.ShapeDtypeStruct((d, f), jnp.float32),       # dw1
            jax.ShapeDtypeStruct((1, f), jnp.float32),       # db1
            jax.ShapeDtypeStruct((f, d), jnp.float32),       # dw2
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # db2
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dlnso
            jax.ShapeDtypeStruct((1, d), jnp.float32),       # dlnbo
        ),
        grid=(n_pad // block_n,),
        in_specs=[
            row(), row(), mat_dd, vec_d, vec_d, vec_d,
            mat_df, vec_f, mat_fd, vec_d, vec_d, vec_d, row(),
        ],
        out_specs=(
            row(), row(), mat_dd, vec_d, vec_d, vec_d,
            mat_df, vec_f, mat_fd, vec_d, vec_d, vec_d,
        ),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * (d + 2 * f) * 3,
            bytes_accessed=(5 * n_pad * d + 2 * (d * d + 2 * d * f))
            * x.dtype.itemsize,
            transcendentals=2 * n_pad * f,
        ),
    )(
        x, attn_out, wo, bo[None, :], lnsa[None, :], lnba[None, :],
        w1, b1[None, :], w2, b2[None, :], lnso[None, :], lnbo[None, :], g,
    )
    (dx, da, dwo, dbo, dlnsa, dlnba, dw1, db1, dw2, db2, dlnso, dlnbo) = outs
    return (
        dx[:n],
        da[:n],
        dwo.astype(wo.dtype),
        dbo[0].astype(bo.dtype),
        dlnsa[0].astype(lnsa.dtype),
        dlnba[0].astype(lnba.dtype),
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b2.dtype),
        dlnso[0].astype(lnso.dtype),
        dlnbo[0].astype(lnbo.dtype),
    )


fused_mpnet_post_vjp.defvjp(_mpnet_post_vjp_fwd, _mpnet_post_vjp_bwd)


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

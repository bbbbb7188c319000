#!/usr/bin/env python
"""Align-segment per-op roofline (VERDICT r3 next-step #2 closure).

The round-3 train-step roofline (tools/profile_train.py, BASELINE.md)
put the align adapter at 126.6 ms fwd+bwd for TWO trainable layers —
nearly the cost of the 12-layer frozen tower forward — because remat
recomputes its forward during the backward and, unlike the tower, it
cannot use the forward-only fused kernels. This tool decomposes the
segment per op-class at the flagship shapes (B=64, L=1408 padded /
1370 real, d=768, bf16), each variant an independently jitted fwd+bwd
on the bench chip:

  full            production (remat, fused_vjp kernels)
  save_attn       remat_policy="save_attn": attention output stays live,
                  the backward recompute shrinks to the pre-attn GEMM
  no_remat        remat off (fits in ISOLATION; in the uncached full
                  step it OOMs a 16 GB part at batch 64 — trainer
                  auto-enables it only under the tower cache)
  impl_packed     packed-attention custom VJP, unfused pre/post chains
  impl_xla        plain jnp layers (XLA fusion only)
  attn_identity   attention replaced by V pass-through: the
                  qkv/proj/MLP/LN GEMM chain alone
  gemm_ceiling_4x the segment's GEMM shapes as flat dots x4 passes
                  (fwd + remat recompute + dgrad + wgrad) — the MXU
                  floor for its matmul work under remat
  gemm_ceiling_3x x3 passes — the floor without the remat recompute

Reference anchor: the adapter is the reference's trainable
align transformer (exp/cxr_pt/model/align_transformers.py:23-45,
2 DINOv2 layers per configs/radzero.yaml:29-34).

Prints one JSON line; publish the table in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=5):
    import numpy as np

    float(np.asarray(fn(*args)))  # compile + first dispatch
    float(np.asarray(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    r = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / iters * 1e3
    assert np.isfinite(r), "variant produced non-finite output"
    return dt


def _gsum(tree):
    """Reduce EVERY leaf of a grad tree to one scalar. Timing
    ``leaves(grad)[0].sum()`` lets XLA dead-code-eliminate the other
    leaves' weight-gradient GEMMs (only the dgrad chain feeding leaf 0
    survives), so fwd+bwd variants undercount backward work by the
    pruned wgrads; summing all leaves keeps them live."""
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(tree))


def main():
    from radzero_tpu.utils import stall_guard

    prodder = stall_guard.install()  # noqa: F841 — tunnel wedge watchdog
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    if jax.default_backend() != "cpu":
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    from radzero_tpu.models.align import build_align_adapter
    from radzero_tpu.models.configuration import AlignConfig

    cfg = AlignConfig()
    init, apply = build_align_adapter(cfg.model_type)
    params = init(jax.random.PRNGKey(0), cfg)

    b, l, real = 64, 1408, 1370
    d, f = cfg.hidden_size, int(cfg.hidden_size * cfg.mlp_ratio)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.standard_normal((b, l, d)) * 0.5, jnp.bfloat16)
    # zero the lane padding like the padded fused tower hands it over
    tokens = tokens.at[:, real:, :].set(0.0)

    segments = {}

    def loss_of(h):
        return jnp.sum(h.astype(jnp.float32) ** 2)

    def seg_grad(c, *, remat=True):
        def fwd(p):
            return loss_of(apply(p, c, tokens, remat=remat, real_len=real))

        g = jax.jit(lambda p: _gsum(jax.grad(fwd)(p)))
        return _timeit(g, params)

    segments["full"] = seg_grad(cfg)
    segments["save_attn"] = seg_grad(
        dataclasses.replace(cfg, remat_policy="save_attn")
    )
    segments["no_remat"] = seg_grad(cfg, remat=False)
    segments["impl_packed"] = seg_grad(dataclasses.replace(cfg, attn_impl="packed"))
    segments["impl_xla"] = seg_grad(dataclasses.replace(cfg, attn_impl="xla"))

    # --- GEMM chain only: attention replaced by V pass-through --------------
    from radzero_tpu.ops.layers import layer_norm, merge_heads, split_heads

    def gemm_layer(x, p):
        cdt = x.dtype
        h = layer_norm(x, p["ln1"], cfg.layer_norm_eps)
        q = split_heads(h @ p["attn"]["q"]["kernel"].astype(cdt)
                        + p["attn"]["q"]["bias"].astype(cdt), cfg.num_attention_heads)
        k = split_heads(h @ p["attn"]["k"]["kernel"].astype(cdt)
                        + p["attn"]["k"]["bias"].astype(cdt), cfg.num_attention_heads)
        v = split_heads(h @ p["attn"]["v"]["kernel"].astype(cdt)
                        + p["attn"]["v"]["bias"].astype(cdt), cfg.num_attention_heads)
        a = merge_heads(v + 1e-6 * (q + k))  # keep q/k live without attention
        a = a @ p["attn"]["o"]["kernel"].astype(cdt) + p["attn"]["o"]["bias"].astype(cdt)
        x = x + p["ls1"].astype(cdt) * a
        h = layer_norm(x, p["ln2"], cfg.layer_norm_eps)
        h = jax.nn.gelu(h @ p["mlp"]["fc1"]["kernel"].astype(cdt)
                        + p["mlp"]["fc1"]["bias"].astype(cdt))
        h = h @ p["mlp"]["fc2"]["kernel"].astype(cdt) + p["mlp"]["fc2"]["bias"].astype(cdt)
        return x + p["ls2"].astype(cdt) * h

    def attn_identity(p):
        body = jax.checkpoint(gemm_layer)

        def scan_body(h, lp):
            return body(h, lp), None

        x, _ = jax.lax.scan(scan_body, tokens, p["layers"])
        return loss_of(x)

    g = jax.jit(lambda p: _gsum(jax.grad(attn_identity)(p)))
    segments["attn_identity"] = _timeit(g, params)

    # --- MXU ceiling: the segment's GEMM shapes as flat dots -----------------
    # (see tools/profile_mpnet.py for why each pass must stay
    # algebraically independent: distinct weights + GELU + per-pass
    # input perturbations, or XLA's simplifier CSEs the passes away)
    n = b * l
    x0 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    wq, wk, wv, wo = (
        jnp.asarray(rng.standard_normal((d, d)), jnp.bfloat16) * 0.02
        for _ in range(4)
    )
    wf1 = jnp.asarray(rng.standard_normal((d, f)), jnp.bfloat16) * 0.02
    wf2 = jnp.asarray(rng.standard_normal((f, d)), jnp.bfloat16) * 0.02
    deltas = jnp.asarray(rng.standard_normal((4, n, d)), jnp.bfloat16) * 0.01

    def gemm_pass(x):
        for _ in range(cfg.num_hidden_layers):
            x = (x @ wq + x @ wk + x @ wv) @ wo
            x = jax.nn.gelu(x @ wf1) @ wf2
        return jnp.sum(x.astype(jnp.float32))

    # deltas ride in as a jit ARGUMENT: closed over, the (4, n, d) array
    # becomes a 553 MB program constant and the remote compile RPC
    # rejects the payload (HTTP 413)
    def gemm_n(x, dl, passes):
        return sum(gemm_pass(x + dl[i]) for i in range(passes))

    segments["gemm_ceiling_4x"] = _timeit(
        jax.jit(lambda x, dl: gemm_n(x, dl, 4)), x0, deltas)
    segments["gemm_ceiling_3x"] = _timeit(
        jax.jit(lambda x, dl: gemm_n(x, dl, 3)), x0, deltas)

    out = {
        "metric": "align_segment_per_op_ms",
        "batch": b, "tokens": l, "real_len": real,
        "segments_ms": {k: round(v, 2) for k, v in segments.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

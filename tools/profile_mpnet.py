#!/usr/bin/env python
"""MPNet-segment per-op roofline (VERDICT r3 next-step #2a).

The round-3 train-step roofline (tools/profile_train.py, BASELINE.md)
showed the MPNet fwd+bwd segment at 118.9 ms for 512 sentences x L32 —
~2.5x its ~47 ms GEMM floor (8.4 TFLOP against the measured 177 TFLOP/s
realizable bf16 peak) while the fused serving tower runs at 72% MFU.
This tool decomposes the segment per op-class to find where the other
~70 ms go, timing each variant as an independently jitted fwd+bwd on
the bench chip at the flagship text shapes (S=512, L=32, bf16, remat):

  full             the production segment (remat, fuse_post, xla attn)
  no_remat         remat off (isolates the recompute cost)
  no_fusepost      fuse_post off (XLA-fused post chain instead of Pallas)
  frozen_embed     gradients stop below the first layer: no (30527, 768)
                   embedding scatter-add wgrad, no embedding-table AdamW
  attn_identity    attention replaced by pass-through of V-heads: the
                   QKV/proj/MLP GEMM + LN chain alone (the "GEMM path")
  attn_only        just attention fwd+bwd at (512, 12, 32, 64) with the
                   (H, L, L) rel bias + key mask
  embed_only       embedding gather + position ids + LN fwd+bwd
  gemm_ceiling     the same per-layer GEMM shapes as flat dots, fwd only
                   x4 passes (fwd + recompute + 2 bwd GEMM passes) — the
                   time the MXU needs for the segment's matmul work

Reference anchor: the segment replaces the per-image ragged MPNet loop
of /root/reference/exp/cxr_pt/model/losses.py:135-147 (HF MPNetModel).

Prints one JSON line; publish the table in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=10):
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

    from radzero_tpu.models.configuration import TextConfig
    from radzero_tpu.models.mpnet import (
        create_position_ids,
        init_mpnet,
        mpnet_forward,
        mpnet_layer,
        relative_position_bucket_table,
    )
    from radzero_tpu.ops.layers import attention, layer_norm, merge_heads, split_heads

    cfg = TextConfig()
    params = init_mpnet(jax.random.PRNGKey(0), cfg)

    s, l, d = 512, int(os.environ.get("PROFILE_L", "32")), cfg.hidden_size
    f = cfg.intermediate_size
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 30000, (s, l)), jnp.int32)
    mask = jnp.ones((s, l), jnp.int32)

    segments = {}

    def seg_grad(fwd):
        """fwd(params) -> scalar; time jitted grad wrt params."""
        g = jax.jit(lambda p: _gsum(jax.grad(fwd)(p)))
        return _timeit(g, params)

    def loss_of(h):
        return jnp.sum(h.astype(jnp.float32) ** 2)

    # --- production segment and its one-knob variants -----------------------
    def full(p, *, remat=True, fuse_post=None, attn_impl=None):
        c = cfg
        if fuse_post is not None or attn_impl is not None:
            c = dataclasses.replace(
                cfg,
                fuse_post=cfg.fuse_post if fuse_post is None else fuse_post,
                attn_impl=cfg.attn_impl if attn_impl is None else attn_impl,
            )
        return loss_of(mpnet_forward(p, c, ids, mask, dtype=jnp.bfloat16, remat=remat))

    segments["full"] = seg_grad(full)
    segments["no_remat"] = seg_grad(lambda p: full(p, remat=False))
    segments["no_fusepost"] = seg_grad(lambda p: full(p, fuse_post=False))

    # --- frozen embeddings: no scatter-add wgrad into the (30527, 768) table
    sub = {"layers": params["layers"], "rel_bias": params["rel_bias"]}

    def frozen_embed_fwd(sp):
        p = {"embeddings": jax.tree.map(jax.lax.stop_gradient, params["embeddings"]),
             "layers": sp["layers"], "rel_bias": sp["rel_bias"]}
        return full(p)

    g = jax.jit(lambda sp: _gsum(jax.grad(frozen_embed_fwd)(sp)))
    segments["frozen_embed"] = _timeit(g, sub)

    # --- GEMM path only: attention replaced by V pass-through ---------------
    def gemm_layer(x, p):
        q = split_heads(x @ p["attn"]["q"]["kernel"].astype(x.dtype)
                        + p["attn"]["q"]["bias"].astype(x.dtype), cfg.num_attention_heads)
        k = split_heads(x @ p["attn"]["k"]["kernel"].astype(x.dtype)
                        + p["attn"]["k"]["bias"].astype(x.dtype), cfg.num_attention_heads)
        v = split_heads(x @ p["attn"]["v"]["kernel"].astype(x.dtype)
                        + p["attn"]["v"]["bias"].astype(x.dtype), cfg.num_attention_heads)
        a = merge_heads(v + 1e-6 * (q + k))  # keep q/k live without attention
        from radzero_tpu.ops.fused_layer import fused_mpnet_post_vjp

        ss, ll, dd = x.shape
        cdt = x.dtype
        out = fused_mpnet_post_vjp(
            x.reshape(ss * ll, dd), a.reshape(ss * ll, dd),
            p["attn"]["o"]["kernel"].astype(cdt), p["attn"]["o"]["bias"].astype(cdt),
            p["ln_attn"]["scale"].astype(cdt), p["ln_attn"]["bias"].astype(cdt),
            p["mlp"]["fc1"]["kernel"].astype(cdt), p["mlp"]["fc1"]["bias"].astype(cdt),
            p["mlp"]["fc2"]["kernel"].astype(cdt), p["mlp"]["fc2"]["bias"].astype(cdt),
            p["ln_out"]["scale"].astype(cdt), p["ln_out"]["bias"].astype(cdt),
            cfg.layer_norm_eps,
        )
        return out.reshape(ss, ll, dd)

    def attn_identity(p):
        emb = p["embeddings"]
        pos_ids = create_position_ids(ids, cfg.pad_token_id)
        x = jnp.take(emb["word"], ids, axis=0) + jnp.take(emb["position"], pos_ids, axis=0)
        x = layer_norm(x.astype(jnp.bfloat16), emb["ln"], cfg.layer_norm_eps)
        body = jax.checkpoint(gemm_layer)

        def scan_body(h, lp):
            return body(h, lp), None

        x, _ = jax.lax.scan(scan_body, x, p["layers"])
        return loss_of(x)

    segments["attn_identity"] = seg_grad(attn_identity)

    # --- attention alone at the segment's shapes -----------------------------
    buckets = jnp.asarray(relative_position_bucket_table(l, cfg.relative_attention_num_buckets))
    rel = jnp.take(params["rel_bias"].astype(jnp.float32), buckets, axis=0).transpose(2, 0, 1)
    neg = jnp.zeros((s, l), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((s, l, cfg.num_attention_heads, cfg.head_dim)), jnp.bfloat16)

    def attn_only(q):
        bias = rel[None].astype(q.dtype) + neg[:, None, None, :].astype(q.dtype)
        outs = q
        for _ in range(cfg.num_hidden_layers):
            outs = attention(outs, outs, outs, bias=bias, scale=cfg.head_dim**-0.5)
        return loss_of(outs)

    g = jax.jit(lambda q: jax.grad(lambda qq: attn_only(qq))(q).sum())
    segments["attn_only"] = _timeit(g, q0)

    # --- embedding block alone ----------------------------------------------
    def embed_only(p):
        emb = p["embeddings"]
        pos_ids = create_position_ids(ids, cfg.pad_token_id)
        x = jnp.take(emb["word"], ids, axis=0) + jnp.take(emb["position"], pos_ids, axis=0)
        x = layer_norm(x.astype(jnp.bfloat16), emb["ln"], cfg.layer_norm_eps)
        return loss_of(x)

    segments["embed_only"] = seg_grad(embed_only)

    # --- MXU ceiling: the segment's GEMM shapes as flat dots -----------------
    # Care: the passes must NOT be algebraically relatable, or XLA's
    # simplifier collapses them (a purely linear chain fed scalar
    # multiples of one input CSEs down to ~one pass — observed: 14.9 ms
    # for a nominal 4x, 3x the chip's bf16 peak). Distinct q/k/v weights,
    # a GELU in the MLP (as the real layer has), and additive random
    # perturbations per pass keep every GEMM live.
    n = s * l
    x0 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    wq, wk, wv, wo = (
        jnp.asarray(rng.standard_normal((d, d)), jnp.bfloat16) * 0.02
        for _ in range(4)
    )
    wf1 = jnp.asarray(rng.standard_normal((d, f)), jnp.bfloat16) * 0.02
    wf2 = jnp.asarray(rng.standard_normal((f, d)), jnp.bfloat16) * 0.02
    deltas = jnp.asarray(rng.standard_normal((4, n, d)), jnp.bfloat16) * 0.01

    def gemm_pass(x):
        # per layer: q, k, v, o (d x d), fc1 (d x f), fc2 (f x d)
        for _ in range(cfg.num_hidden_layers):
            x = (x @ wq + x @ wk + x @ wv) @ wo
            x = jax.nn.gelu(x @ wf1) @ wf2
        return jnp.sum(x.astype(jnp.float32))

    def gemm4(x):  # fwd + remat recompute + dgrad + wgrad ~ 4 forward passes
        return sum(gemm_pass(x + deltas[i]) for i in range(4))

    segments["gemm_ceiling_4x"] = _timeit(jax.jit(gemm4), x0)

    out = {
        "metric": "mpnet_segment_per_op_ms",
        "sentences": s, "text_len": l,
        "segments_ms": {k: round(v, 2) for k, v in segments.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

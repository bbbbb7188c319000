#!/usr/bin/env python
"""Two-head-packed score-GEMM probe (VERDICT r3 next-step #8).

The serving attention kernel's score GEMM runs at the hd=64 MXU
ceiling (~50% — the MXU contracts 128 lanes, BASELINE.md). True
head-merging is semantically unavailable (summing the contraction mixes
heads), but a BLOCK-MASKED packing is not: stack two heads' queries
along the feature axis (q' = [q_h | q_h+1], contraction 128) and give
each key row only one head's half (k' block-diagonal, doubling the key
rows). The (L, 2L) result holds head h's scores in columns [0, L) and
head h+1's in [L, 2L). That trades 2x the score FLOPs (half of them
multiplies-by-zero) for full 128-lane MXU occupancy — a wash on paper,
measured here because Mosaic/XLA layout effects can tip it either way.

Measures raw dot_generals at the serving attention shapes (batch 64
images, 1408 padded tokens, 12 heads of 64): if the packed layout is
not decisively faster even as a bare GEMM, the kernel rework is ruled
out (ROADMAP one-liner); if it is, it motivates a Pallas variant.

Reference anchor: serving hot path /root/reference/exp/cxr_pt/model/
modeling.py:278-328 (the ViT attention under compute_logits).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_timeit():
    """Tunnel-safe timer (same methodology as tools/profile_vit.py):
    ``block_until_ready`` through the axon proxy does NOT serialize
    (observed 1988 "TFLOP/s" at hd=64, ~10x the chip's peak), so the
    only reliable fence is a host fetch of a scalar computed FROM the
    last output — the data dependency forces every queued dispatch to
    complete before the float crosses the tunnel."""
    import jax
    import jax.numpy as jnp

    sync_jit = jax.jit(lambda leaf: jnp.sum(leaf.astype(jnp.float32)))

    def timeit(fn, *args, iters=20):
        out = fn(*args)             # compile the op
        float(sync_jit(out))        # compile the sync-sum OUTSIDE the window
        best = float("inf")
        for _ in range(2):          # best-of-2 windows: tunnel jitter
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            v = float(sync_jit(out))
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best, v

    return timeit


def main():
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

    B, H, L, hd = 64, 12, 1408, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B * H, L, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B * H, L, hd)), jnp.bfloat16)

    @jax.jit
    def baseline(q, k):
        # (BH, L, hd) x (BH, L, hd) -> (BH, L, L): the per-head score GEMM
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    # packed: pairs of heads share one GEMM with contraction 128.
    # q2: (BH/2, L, 128) = [q_even | q_odd]; k2: (BH/2, 2L, 128) with
    # k_even in rows [0, L) cols [0, 64) and k_odd in rows [L, 2L)
    # cols [64, 128) — the cross blocks are ZERO, so out[:, :, :L] are
    # the even head's scores and out[:, :, L:] the odd head's.
    qe = q.reshape(B * H // 2, 2, L, hd)
    q2 = jnp.concatenate([qe[:, 0], qe[:, 1]], axis=-1)  # (BH/2, L, 128)
    ke = k.reshape(B * H // 2, 2, L, hd)
    zero = jnp.zeros_like(ke[:, 0])
    k2 = jnp.concatenate(
        [jnp.concatenate([ke[:, 0], zero], axis=-1),
         jnp.concatenate([zero, ke[:, 1]], axis=-1)],
        axis=1,
    )  # (BH/2, 2L, 128)

    @jax.jit
    def packed(q2, k2):
        return jax.lax.dot_general(
            q2, k2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    _timeit = _make_timeit()
    dt_base, v0 = _timeit(baseline, q, k)
    dt_pack, _ = _timeit(packed, q2, k2)

    # correctness of the packing (spot check). NOT bit-exact: the
    # 128-lane contraction accumulates in a different order than the
    # 64-lane one (fp32 addition is non-associative), so allow
    # reduction-reorder noise. Slice ON DEVICE: the full score tensors
    # are ~6 GB each and must not ride the host tunnel.
    sb = np.asarray(jax.jit(lambda q, k: baseline(q, k)[:2, :4])(q, k))
    sp = np.asarray(jax.jit(lambda q2, k2: packed(q2, k2)[0, :4])(q2, k2))
    np.testing.assert_allclose(sp[:, :L], sb[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sp[:, L:], sb[1], rtol=1e-4, atol=1e-5)

    flops = 2 * B * H * L * L * hd
    out = {
        "metric": "headpack_score_gemm_probe",
        "shape": {"B": B, "H": H, "L": L, "head_dim": hd},
        "baseline_hd64_ms": round(dt_base, 3),
        "packed_hd128_blockmask_ms": round(dt_pack, 3),
        "baseline_tflops": round(flops / dt_base / 1e9, 1),
        "speedup": round(dt_base / dt_pack, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

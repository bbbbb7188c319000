"""VL-CABS: vision-language cosine cross-attention with before-softmax scores.

The core novelty of RadZero (ref exp/cxr_pt/model/losses.py:187-240,
``SimilarityLogit``): for every text query against every image's token
set, compute per-token similarity scores, softmax-aggregate the tokens,
and produce one normalized-dot logit per (text, image) pair — returning
the *pre-softmax* score map as the explainable similarity map.

Math per (image b, query n), tokens t_b in R^{L x D}, query q_n in R^D:

    sim_op == "cos":  s = cos(q_n, t_b) / tau        (losses.py:208-213)
    sim_op == "dot":  s = (q_n . t_b) / sqrt(D)      (losses.py:214-215)
    a   = softmax(s)                                 (losses.py:222)
    agg = a @ t_b                                    (losses.py:224)
    logit = l2(q_n) . l2(agg)                        (losses.py:226-231)

Returned:
    logits (N, B)   — note the transpose (losses.py:233)
    scores (B, N, L)

TPU-native formulation: the whole (B_images x N_texts) product is one
batched einsum chain — no Python loops, no per-sentence forward calls
(the reference's per-image loop, losses.py:135-147, is flattened away).
All contractions ride the MXU; softmax runs in fp32.

A fused Pallas kernel (radzero_tpu.ops.pallas_vlcabs) implements the
same contract blockwise for large B*N; this module is the jnp
reference and the autodiff path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from radzero_tpu.ops.layers import l2_normalize


def vlcabs_similarity(
    queries: jnp.ndarray,        # (N, D) text query features
    tokens: jnp.ndarray,         # (B, L, D) vision tokens (CLS first if used)
    *,
    sim_op: str = "cos",
    temperature: Optional[jnp.ndarray] = None,  # scalar tau (required for cos)
    need_scores: bool = False,
    impl: str = "xla",           # xla | fused (fwd-only) | fused_train (custom VJP)
    mesh=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Compute (logits (N, B), scores (B, N, L)) — SimilarityLogit semantics.

    ``impl``:
        xla          jnp einsum chain — differentiable, any sim_op
        fused        Pallas forward emitting logits + score map (serving)
        fused_train  Pallas forward + flash-style recompute backward —
                     differentiable, never materialises (B, N, L) in HBM
                     (cos only; scores are not available on this path)

    ``mesh`` (fused_train only): partition the kernel over the mesh's
    'data' axis with shard_map — queries replicate (the all-gather the
    reference does by hand, losses.py:156-161), tokens stay sharded on
    B, and each device runs the kernel on its local images; the
    transpose of the query broadcast psums dq across devices
    (``dist.nn.all_gather``'s full-gradient semantics). Without this,
    the SPMD partitioner treats the custom call as opaque and
    replicates the full global product on every device.
    """
    compute_dtype = tokens.dtype

    if impl == "fused_train" and sim_op == "cos":
        if need_scores:
            raise ValueError("fused_train does not emit score maps")
        from radzero_tpu.ops.pallas_vlcabs import vlcabs_fused_train

        qn = l2_normalize(queries.astype(compute_dtype))
        if mesh is not None and "data" in mesh.axis_names:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            fn = shard_map(
                vlcabs_fused_train,
                mesh=mesh,
                in_specs=(P(), P("data"), P()),
                out_specs=P(None, "data"),
                check_rep=False,
            )
            return fn(qn, tokens, temperature), None
        return vlcabs_fused_train(qn, tokens, temperature), None

    if impl == "fused" and sim_op == "cos":
        from radzero_tpu.ops.pallas_vlcabs import vlcabs_fused

        qn = l2_normalize(queries.astype(compute_dtype))
        logits, scores = vlcabs_fused(qn, tokens, temperature)
        return logits, (scores if need_scores else None)

    if sim_op == "cos":
        if temperature is None:
            raise ValueError("cos sim_op requires a temperature")
        qn = l2_normalize(queries.astype(compute_dtype))
        # NOTE: in cos mode the reference rebinds local_tokens to the
        # l2-normalised tokens (losses.py:212-213) — aggregation below
        # therefore runs over the NORMALISED tokens
        agg_tokens = l2_normalize(tokens)
        scores = jnp.einsum("nd,bld->bnl", qn, agg_tokens) / temperature.astype(compute_dtype)
    elif sim_op == "dot":
        denom = jnp.sqrt(jnp.asarray(tokens.shape[-1], compute_dtype))
        agg_tokens = tokens
        scores = jnp.einsum("nd,bld->bnl", queries.astype(compute_dtype), tokens) / denom
    else:
        raise NotImplementedError(f"sim_op {sim_op!r}")

    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(compute_dtype)
    aggregated = jnp.einsum("bnl,bld->bnd", attn, agg_tokens)

    qn2 = l2_normalize(jnp.broadcast_to(queries.astype(compute_dtype), aggregated.shape))
    aggn = l2_normalize(aggregated)
    logits = jnp.einsum("bnd,bnd->bn", qn2, aggn)  # (B, N)
    logits = logits.T  # (N, B) — reference returns the transpose (losses.py:233)

    return logits, (scores if need_scores else None)

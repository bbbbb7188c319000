"""Numeric tests for VL-CABS similarity and MP-NCE loss.

Oracles are independent numpy implementations of the published math
(arXiv:2504.07416 §3; behavior documented from losses.py:187-344).
The key structural property under test: the masked static-shape
formulation equals the ragged real-rows-only computation.
"""

import numpy as np
import jax.numpy as jnp

from radzero_tpu.ops.vlcabs import vlcabs_similarity
from radzero_tpu.losses.mpnce import multi_positive_nce_loss


def _np_l2(x, axis=-1, eps=1e-12):
    n = np.sqrt((x * x).sum(axis=axis, keepdims=True))
    return x / np.maximum(n, eps)


def _np_softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def _oracle_vlcabs(queries, tokens, sim_op, tau):
    N, D = queries.shape
    B, L, _ = tokens.shape
    logits = np.zeros((N, B), np.float64)
    scores = np.zeros((B, N, L), np.float64)
    for b in range(B):
        for n in range(N):
            q, t = queries[n].astype(np.float64), tokens[b].astype(np.float64)
            if sim_op == "cos":
                # cos mode aggregates the NORMALISED tokens (losses.py:212-224)
                tn = _np_l2(t)
                s = (_np_l2(q[None])[0] @ tn.T) / tau
                agg_src = tn
            else:
                s = (q @ t.T) / np.sqrt(D)
                agg_src = t
            a = _np_softmax(s)
            agg = a @ agg_src
            logits[n, b] = float(_np_l2(q[None])[0] @ _np_l2(agg[None])[0])
            scores[b, n] = s
    return logits, scores


def test_vlcabs_cos_matches_oracle():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    t = rng.standard_normal((3, 7, 16)).astype(np.float32)
    tau = 0.07
    logits, scores = vlcabs_similarity(
        jnp.asarray(q), jnp.asarray(t), sim_op="cos", temperature=jnp.asarray(tau), need_scores=True
    )
    ref_logits, ref_scores = _oracle_vlcabs(q, t, "cos", tau)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-4, atol=1e-4)


def test_vlcabs_dot_matches_oracle():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    t = rng.standard_normal((2, 5, 8)).astype(np.float32)
    logits, scores = vlcabs_similarity(
        jnp.asarray(q), jnp.asarray(t), sim_op="dot", need_scores=True
    )
    ref_logits, ref_scores = _oracle_vlcabs(q, t, "dot", None)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# MP-NCE
# ---------------------------------------------------------------------------

def _oracle_mpnce(logits, group_map, tau, eps=1e-8, row_sum=False, col_sum=False):
    """Ragged oracle over real rows only (losses.py:243-344 behavior)."""
    S, B = logits.shape
    e = np.exp(logits.astype(np.float64) / tau)
    pos = e[np.arange(S), group_map]

    if row_sum:
        rs = np.zeros(B)
        rp = np.zeros(B)
        np.add.at(rs, group_map, e.sum(1))
        np.add.at(rp, group_map, pos)
        row = -np.log(rp / (rs + eps) + eps)
    else:
        row = -np.log(pos / (e.sum(1) + eps) + eps)

    neg_mask = np.ones_like(e)
    neg_mask[np.arange(S), group_map] = 0
    if col_sum:
        cs = e.sum(0)
        cp = (e * (1 - neg_mask)).sum(0)
        col = -np.log(cp / (cs + eps) + eps)
    else:
        sn = (e * neg_mask).sum(0)[group_map]
        col = -np.log(pos / (pos + sn + eps) + eps)

    return (row.mean() + col.mean()) / 2


def _rand_case(rng, S=11, B=4):
    logits = rng.standard_normal((S, B)).astype(np.float32) * 0.5
    group = rng.integers(0, B, size=S)
    # ensure every image has at least one sentence
    group[:B] = np.arange(B)
    return logits, group.astype(np.int32)


def test_mpnce_variants_match_oracle():
    rng = np.random.default_rng(2)
    logits, group = _rand_case(rng)
    for row_sum in (False, True):
        for col_sum in (False, True):
            ref = _oracle_mpnce(logits, group, 0.07, row_sum=row_sum, col_sum=col_sum)
            out = multi_positive_nce_loss(
                jnp.asarray(logits), jnp.asarray(group), temperature=0.07,
                row_sum=row_sum, col_sum=col_sum,
            )
            np.testing.assert_allclose(float(out), ref, rtol=1e-5, atol=1e-6)


def test_mpnce_padding_invariance():
    """Masked padded rows must not change the loss (static-shape equivalence)."""
    rng = np.random.default_rng(3)
    logits, group = _rand_case(rng)
    S, B = logits.shape
    ref = _oracle_mpnce(logits, group, 0.07)

    pad = 6
    logits_p = np.concatenate([logits, rng.standard_normal((pad, B)).astype(np.float32)], 0)
    group_p = np.concatenate([group, np.zeros(pad, np.int32)])
    mask = np.concatenate([np.ones(S, np.float32), np.zeros(pad, np.float32)])

    out = multi_positive_nce_loss(
        jnp.asarray(logits_p), jnp.asarray(group_p), temperature=0.07,
        row_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(float(out), ref, rtol=1e-5, atol=1e-6)

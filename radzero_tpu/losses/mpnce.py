"""Multi-positive noise-contrastive loss (MP-NCE), masked static-shape form.

Re-derivation of the reference's ``multi_positive_nce_loss``
(exp/cxr_pt/model/losses.py:243-344) for TPU static shapes: the
reference materialises exactly N_total real sentence rows after its
pad-and-trim all_gather; here rows are padded to a static maximum and a
``row_mask`` excludes padding from every sum and from the final means,
which is mathematically identical to the trimmed computation.

Shapes:
    logits    (S, B)  — one row per key-phrase sentence, one column per
                        global-batch image (t2i logits from VL-CABS)
    group_map (S,)    — global image index owning each sentence
    row_mask  (S,)    — 1.0 for real sentences, 0.0 for padding

Variants preserved (losses.py:296-344):
    row_sum=False : per-row InfoNCE   p_row_i = pos_i / (sum_j e_ij + eps)
    row_sum=True  : grouped row loss via scatter-add over group_map
    col_sum=False : MP-NCE (UniCLIP)  p_col_i = pos_i / (pos_i + neg_col(g_i) + eps)
    col_sum=True  : MIL-NCE           p_col_j = sum_pos_j / (sum_col_j + eps)

eps = 1e-8 exactly as the reference.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def multi_positive_nce_loss(
    logits: jnp.ndarray,
    group_map: jnp.ndarray,
    temperature: jnp.ndarray | float = 1.0,
    eps: float = 1e-8,
    row_sum: bool = False,
    col_sum: bool = False,
    row_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    S, B = logits.shape
    logits = logits.astype(jnp.float32)
    if row_mask is None:
        row_mask = jnp.ones((S,), jnp.float32)
    row_mask = row_mask.astype(jnp.float32)

    scaled = jnp.exp(logits / temperature) * row_mask[:, None]  # (S, B); padded rows -> 0

    # one-hot of each sentence's positive image column, zeroed on padded rows
    pos_onehot = (jnp.arange(B)[None, :] == group_map[:, None]).astype(jnp.float32)
    pos_onehot = pos_onehot * row_mask[:, None]

    pos = jnp.sum(scaled * pos_onehot, axis=1)  # (S,) == scaled[i, g_i] on real rows

    # ---- row loss (losses.py:296-320)
    if row_sum:
        # scatter-add row sums into per-image groups
        row_sum_logits = pos_onehot.T @ jnp.sum(scaled, axis=1)  # (B,)
        row_pos_sum = pos_onehot.T @ pos                         # (B,)
        p_row = row_pos_sum / (row_sum_logits + eps)             # (B,)
        # reference takes mean over B entries (groups with no sentences give
        # -log(eps); with the static packing every image has >= 1 sentence)
        row_loss = -jnp.log(p_row + eps)
        row_loss_mean = jnp.mean(row_loss)
    else:
        row_sum_logits = jnp.sum(scaled, axis=1)                 # (S,)
        p_row = pos / (row_sum_logits + eps)
        row_loss = -jnp.log(p_row + eps) * row_mask
        row_loss_mean = jnp.sum(row_loss) / jnp.maximum(jnp.sum(row_mask), 1.0)

    # ---- column loss (losses.py:323-344)
    neg_mask = (1.0 - pos_onehot) * row_mask[:, None]            # (S, B)
    if col_sum:
        column_sum = jnp.sum(scaled, axis=0)                     # (B,)
        column_pos = jnp.sum(scaled * pos_onehot, axis=0)        # (B,)
        p_col = column_pos / (column_sum + eps)                  # (B,)
        col_loss_mean = jnp.mean(-jnp.log(p_col + eps))
    else:
        sum_neg = jnp.sum(scaled * neg_mask, axis=0)             # (B,) per-column negatives
        sum_neg_i = jnp.sum(pos_onehot * sum_neg[None, :], axis=1)  # (S,) = sum_neg[g_i]
        p_col = pos / (pos + sum_neg_i + eps)
        col_loss = -jnp.log(p_col + eps) * row_mask
        col_loss_mean = jnp.sum(col_loss) / jnp.maximum(jnp.sum(row_mask), 1.0)

    return (row_loss_mean + col_loss_mean) / 2.0

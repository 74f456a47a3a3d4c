"""Attention-MIL margin ranking loss.

Vectorized equivalent of the reference's ``ATTMILLoss`` (active class,
`margin_rank_loss.py:45-84`): for each (block, sample, valid object slot),
compare attention mass that a visual row puts on scene-graph *neighbor*
columns vs non-neighbor columns, under a margin ranking hinge
``max(0, neg - pos + margin)`` with margin 0.6.

Reference quirks preserved:

* only the first attention head feeds the loss — the reference indexes the
  ``(h*N, Tq, Tk)`` tensor by sample id, which under head-major stacking picks
  head 0 (`margin_rank_loss.py:63`);
* the attention row index is the object slot *position* ``j_``, not the
  visual row id (`margin_rank_loss.py:66-67`);
* the loss buffer is preallocated at ``blocks * B * Ls`` and unfilled slots
  remain (0, 0) pairs, each contributing ``margin`` to the mean
  (`margin_rank_loss.py:59-60,82`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def att_mil_loss(
    att_weights: Sequence[jax.Array],  # each (B, H, Tq, Ls)
    idx_of_obj: jax.Array,             # (B, O) syb row per object slot, -1 pad
    syb_graph: jax.Array,              # (B, Ls, Ls)
    margin: float = 0.6,
) -> jax.Array:
    b, ls = syb_graph.shape[:2]
    blocks = len(att_weights)
    valid = idx_of_obj >= 0                        # (B, O)
    o = idx_of_obj.shape[1]
    bi = jnp.arange(b)[:, None]
    safe = jnp.clip(idx_of_obj, 0, ls - 1)
    neigh = (syb_graph[bi, safe] > 0).astype(jnp.float32)   # (B, O, Ls)

    total = jnp.float32(0.0)
    n_valid = jnp.sum(valid.astype(jnp.float32))
    for att in att_weights:
        rows = att[:, 0, :o, :].astype(jnp.float32)         # head 0, slot rows
        pos = jnp.sum(rows * neigh, axis=-1)                # (B, O)
        neg = jnp.sum(rows * (1.0 - neigh), axis=-1)
        hinge = jnp.maximum(0.0, neg - pos + margin)
        total = total + jnp.sum(jnp.where(valid, hinge, 0.0))

    denom = blocks * b * ls
    unfilled = denom - blocks * n_valid
    return (total + unfilled * margin) / denom

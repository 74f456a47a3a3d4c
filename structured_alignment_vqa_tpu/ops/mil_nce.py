"""Pure math for the MIL-NCE structured-alignment objective.

The parameterized module (embeddings, MLPs, the per-relation bilinear tensor)
lives in `models/att_model_x3.py`; this file holds the static-shape, masked
re-formulations of the reference's dynamic-shape score bookkeeping
(`/root/reference/models/AttModel_x3.py:365-439`):

* The reference gathers only *valid* candidate scores into ragged vectors and
  runs logsumexp/softmax over them. XLA needs static shapes, so we keep every
  slot and mask invalid ones to -inf inside logsumexp — mathematically
  identical because exp(-inf) = 0.
* The relation-rewrite path indexes a softmax over the *compacted* vector of
  valid positive scores by raw ``micro_rel_loc`` values
  (`AttModel_x3.py:420-436`). :func:`compact_softmax_gather` reproduces that
  compaction order (batch-major, as ``tensor.nonzero()`` enumerates) with a
  rank scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Scores are clamped at this floor before logsumexp/softmax
# (`AttModel_x3.py:367,414`: ``.clamp(min=eps)`` with eps=1e-6).
MIL_EPS = 1e-6


def masked_logsumexp(x: jax.Array, valid: jax.Array, axis=None) -> jax.Array:
    """logsumexp over ``axis`` counting only entries where ``valid`` is true."""
    masked = jnp.where(valid, x, -jnp.inf)
    return jax.scipy.special.logsumexp(masked, axis=axis)


def mil_nce_obj_objective(pos_scores: jax.Array, neg_scores: jax.Array) -> jax.Array:
    """Object-branch MIL-NCE, exactly as `AttModel_x3.py:365-367`.

    Args:
      pos_scores / neg_scores: (B, O, topN) object-candidate-vs-visual dot
        scores **already multiplied by the object validity mask** (masked slots
        are exactly 0, like the reference's ``micro_obj_mask_4D *`` product).

    The reference clamps everything (including masked zeros) to eps=1e-6,
    concatenates a same-shape all-eps block into the numerator and the negative
    block into the denominator along the object axis, logsumexps over the topN
    axis, and takes the global mean of (numerator - denominator).
    """
    pos_c = jnp.maximum(pos_scores.astype(jnp.float32), MIL_EPS)
    neg_c = jnp.maximum(neg_scores.astype(jnp.float32), MIL_EPS)
    eps_block = jnp.full_like(neg_c, MIL_EPS)
    numerator = jax.scipy.special.logsumexp(
        jnp.concatenate([pos_c, eps_block], axis=1), axis=2
    )
    denominator = jax.scipy.special.logsumexp(
        jnp.concatenate([pos_c, neg_c], axis=1), axis=2
    )
    return jnp.mean(numerator - denominator)


def mil_nce_rel_objective(
    pos_scores: jax.Array,
    pos_valid: jax.Array,
    neg_scores: jax.Array,
    neg_valid: jax.Array,
) -> jax.Array:
    """Relation-branch MIL-NCE (`AttModel_x3.py:403-414`) with validity masks.

    Args:
      pos_scores/neg_scores: flattened (B*R,) gathered bilinear scores.
      pos_valid/neg_valid: matching (B*R,) booleans (loc >= 0 slots).

    ``logsumexp(valid pos) - logsumexp(valid pos U valid neg)`` with each valid
    score clamped at eps, matching the reference's gather-then-clamp order.
    """
    pos_c = jnp.where(pos_valid, jnp.maximum(pos_scores.astype(jnp.float32), MIL_EPS), -jnp.inf)
    neg_c = jnp.where(neg_valid, jnp.maximum(neg_scores.astype(jnp.float32), MIL_EPS), -jnp.inf)
    lse_pos = jax.scipy.special.logsumexp(pos_c)
    lse_all = jax.scipy.special.logsumexp(jnp.concatenate([pos_c, neg_c]))
    return lse_pos - lse_all


def compact_softmax_gather(
    scores: jax.Array, valid: jax.Array, gather_idx: jax.Array
) -> jax.Array:
    """Softmax over compacted valid scores, then lookup by raw index.

    Reproduces `AttModel_x3.py:420-427`: the reference builds the vector of
    valid positive scores in batch-major enumeration order, softmaxes it
    (over *all* positives in the batch jointly), and reads entry
    ``micro_rel_loc`` of that compacted vector for each positive.

    Args:
      scores: (M,) raw gathered scores, batch-major flattening.
      valid: (M,) booleans.
      gather_idx: (M,) integer indices into the *compacted* softmax vector.

    Returns:
      (M,) weights; indices beyond the number of valid entries return 0
      (the reference would raise an index error there — such data never occurs
      in its pipeline, so 0 is a safe total extension).
    """
    m = scores.shape[0]
    sc = jnp.where(valid, jnp.maximum(scores.astype(jnp.float32), MIL_EPS), -jnp.inf)
    sm = jax.nn.softmax(sc)  # invalid slots -> exactly 0
    ranks = jnp.cumsum(valid.astype(jnp.int32)) - 1  # compacted position per valid slot
    scatter_to = jnp.where(valid, ranks, m)  # invalid slots dropped by mode='drop'
    compact = jnp.zeros((m,), dtype=sm.dtype).at[scatter_to].add(sm, mode="drop")
    safe_idx = jnp.clip(gather_idx, 0, m - 1)
    out = compact[safe_idx]
    return jnp.where((gather_idx >= 0) & (gather_idx < m), out, 0.0)

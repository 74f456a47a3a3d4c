"""Synthetic batch generation: structurally-consistent random VQA batches.

Used by unit tests, `bench.py`, and the driver graft entry. Shapes and
invariants follow the production collate
(`data_loader_itp_bbox_super_node_onlyobj.py:341-445`):

* vis/macro/question masks are top-left validity squares,
* every object slot o < n_obj has a distinct macro row in ``macro_obj_loc``,
* adjacency matrices are 0/1 with edges only between valid nodes,
* relation loc records are [obj_i, obj_j, rel_cat, macro_loc, micro_loc] with
  -1 padding rows.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.batch import VQABatch
from structured_alignment_vqa_tpu.models.config import ModelConfig


def _square_mask(batch: int, size: int, lengths: np.ndarray) -> np.ndarray:
    m = np.zeros((batch, size, size), np.int32)
    for i, n in enumerate(lengths):
        m[i, :n, :n] = 1
    return m


def _random_graph(rng, batch: int, size: int, lengths: np.ndarray, p=0.3) -> np.ndarray:
    g = (rng.random((batch, size, size)) < p).astype(np.int32)
    for i, n in enumerate(lengths):
        g[i, n:, :] = 0
        g[i, :, n:] = 0
    return g


def synthetic_batch(
    cfg: ModelConfig,
    batch: int = 4,
    lv: int | None = None,
    lq: int | None = None,
    ls: int | None = None,
    n_rel: int = 6,
    seed: int = 0,
) -> VQABatch:
    """A random batch consistent with the production data layout."""
    rng = np.random.default_rng(seed)
    lv = lv or cfg.maxlen_v
    lq = lq or cfg.maxlen_q
    ls = ls or max(cfg.maxlen - lq, 2 * lv)
    pad = cfg.vocab_size - 2  # stand-in for PAD=400000 under a tiny test vocab

    n_vis = rng.integers(1, lv + 1, size=batch)
    n_q = rng.integers(1, lq + 1, size=batch)
    n_macro = np.minimum(ls, n_vis * 2 + rng.integers(0, 3, size=batch))

    vis_fea = rng.standard_normal((batch, lv, cfg.vis_fea_dim)).astype(np.float32)
    for i, n in enumerate(n_vis):
        vis_fea[i, n:] = 0.0

    macro_ipt = np.full((batch, ls), pad, np.int64)
    macro_obj_loc = np.full((batch, lv), -1, np.int64)
    for i in range(batch):
        macro_ipt[i, : n_macro[i]] = rng.integers(1, cfg.vocab_size - 4, size=n_macro[i])
        # object slots occupy even macro rows (super nodes), like convert_graph
        locs = np.arange(n_vis[i]) * 2
        locs = locs[locs < n_macro[i]]
        macro_obj_loc[i, : len(locs)] = locs

    q_ipt = np.full((batch, lq), pad, np.int64)
    for i, n in enumerate(n_q):
        q_ipt[i, :n] = rng.integers(1, cfg.vocab_size - 4, size=n)

    topn = cfg.topn
    micro_pos = np.full((batch, lv, topn), pad, np.int64)
    micro_neg = np.full((batch, lv, topn), pad, np.int64)
    micro_mask = np.zeros((batch, lv, topn), np.int32)
    for i, n in enumerate(n_vis):
        micro_pos[i, :n] = rng.integers(1, cfg.vocab_size - 4, size=(n, topn))
        micro_neg[i, :n] = rng.integers(1, cfg.vocab_size - 4, size=(n, topn))
        micro_mask[i, :n] = 1

    pos_rel = np.full((batch, n_rel), pad, np.int64)
    neg_rel = np.full((batch, n_rel), pad, np.int64)
    pos_loc = np.full((batch, n_rel, 5), -1, np.int64)
    neg_loc = np.full((batch, n_rel, 5), -1, np.int64)
    for i in range(batch):
        k = int(rng.integers(0, n_rel + 1))
        n_obj = int(np.sum(macro_obj_loc[i] >= 0))
        if n_obj == 0 or k == 0:
            continue
        pos_rel[i, :k] = rng.integers(1, cfg.vocab_size - 4, size=k)
        neg_rel[i, :k] = rng.integers(1, cfg.vocab_size - 4, size=k)
        for j in range(k):
            oi, oj = rng.integers(0, n_obj, size=2)
            cat = int(rng.integers(0, cfg.num_relations))
            macro_loc = int(rng.integers(0, n_macro[i]))
            pos_loc[i, j] = [oi, oj, cat, macro_loc, j]
            oi2, oj2 = rng.integers(0, n_obj, size=2)
            neg_loc[i, j] = [oi2, oj2, int(rng.integers(0, cfg.num_relations)), macro_loc, j]

    return VQABatch(
        vis_fea=jnp.asarray(vis_fea),
        vis_mask=jnp.asarray(_square_mask(batch, lv, n_vis)),
        q_ipt=jnp.asarray(q_ipt, jnp.int32),
        q_mask=jnp.asarray(_square_mask(batch, lq, n_q)),
        q_graph=jnp.asarray(_random_graph(rng, batch, lq, n_q)),
        macro_ipt=jnp.asarray(macro_ipt, jnp.int32),
        macro_mask=jnp.asarray(_square_mask(batch, ls, n_macro)),
        macro_graph=jnp.asarray(_random_graph(rng, batch, ls, n_macro)),
        macro_obj_loc=jnp.asarray(macro_obj_loc, jnp.int32),
        micro_pos_obj=jnp.asarray(micro_pos, jnp.int32),
        micro_neg_obj=jnp.asarray(micro_neg, jnp.int32),
        micro_obj_mask=jnp.asarray(micro_mask),
        micro_pos_rel=jnp.asarray(pos_rel, jnp.int32),
        micro_neg_rel=jnp.asarray(neg_rel, jnp.int32),
        micro_pos_rel_loc=jnp.asarray(pos_loc, jnp.int32),
        micro_neg_rel_loc=jnp.asarray(neg_loc, jnp.int32),
        answer=jnp.asarray(rng.integers(0, cfg.num_classes, size=batch), jnp.int32),
        sample_valid=jnp.ones((batch,), jnp.int32),
    )

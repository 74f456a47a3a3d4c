"""Legacy whole-array loader (the `dataloader/data_load*.py` tier).

The earliest reference pipeline pre-tokenized everything into giant padded
numpy tensors: token-id sentences for the symbolic/visual branches, one-token
answers, and three staged (maxlen x maxlen) graph tensors per branch
(`dataloader/data_load.py:37-153`; the `_args`/`_args_grid` twins only swap
the missing ``hyperparams`` module for argparse args and mark grid-feature
self-connectivity, SURVEY.md section 2.3). These arrays fed the pre-tar training
scripts; the loader survives here for migrating that data format.

Semantics preserved from ``create_data``:

* tokens: graph-vocab ids with the *string* ``'400001'`` as the OOV fallback
  (the reference's ``de2idx.get(word, '400001')`` mixes str into int arrays;
  we coerce to int 400001);
* samples longer than maxlen or with empty region features are skipped;
* stage graphs: G1 = cross-modality blocks + explicit edges, G2 = cross
  blocks only, G3 = question-question block; the visual variants are offset
  by the region count; ``grid_self_connect`` additionally sets the
  vis-vis block to 1 (the `_grid` twin's one-line diff).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from structured_alignment_vqa_tpu.models.glove import SPECIALS

PAD = SPECIALS.PAD
UNK = SPECIALS.UNK


@dataclasses.dataclass
class ArrayBundle:
    X_syb: np.ndarray   # (N, maxlen) int32
    X_vis: np.ndarray   # (N, maxlen) int32
    Y: np.ndarray       # (N, 1) int32
    G_syb: Tuple[np.ndarray, np.ndarray, np.ndarray]
    G_vis: Tuple[np.ndarray, np.ndarray, np.ndarray]
    X0: List[np.ndarray]  # per-sample region features


def create_arrays(
    sents_syb: Sequence[str],
    sents_vis: Sequence[str],
    answers: Sequence[str],
    edges_syb: Sequence[Sequence],
    edges_vis: Sequence[Sequence],
    region_feats: Sequence[np.ndarray],
    q_lengths: Sequence[int],
    de2idx: dict,
    en2idx: dict,
    maxlen: int,
    grid_self_connect: bool = False,
) -> ArrayBundle:
    xs, xv, ys, gs, gv, x0s, qs = [], [], [], [], [], [], []
    for s_syb, s_vis, ans, g_syb, g_vis, feat, q_id in zip(
        sents_syb, sents_vis, answers, edges_syb, edges_vis, region_feats, q_lengths
    ):
        x_syb = [int(de2idx.get(w, UNK + 0)) for w in (s_syb + " </s>").split()]
        x_vis = [int(de2idx.get(w, UNK + 0)) for w in (s_vis + " </s>").split()]
        y = [en2idx.get(ans, 1)]
        if len(x_syb) <= maxlen and feat.shape[0] != 0:
            xs.append(np.asarray(x_syb))
            xv.append(np.asarray(x_vis))
            ys.append(np.asarray(y))
            gs.append(np.asarray(g_syb))
            gv.append(np.asarray(g_vis))
            x0s.append(feat)
            qs.append(q_id + 1)

    n = len(xs)
    X_syb = np.full((n, maxlen), PAD, np.int32)
    X_vis = np.full((n, maxlen), PAD, np.int32)
    Y = np.zeros((n, 1), np.int32)
    G_syb = [np.zeros((n, maxlen, maxlen), np.int8) for _ in range(3)]
    G_vis = [np.zeros((n, maxlen, maxlen), np.int8) for _ in range(3)]

    for i, (x_syb, x_vis, y, g_syb, g_vis, x0, q_len) in enumerate(
        zip(xs, xv, ys, gs, gv, x0s, qs)
    ):
        X_syb[i, : len(x_syb)] = x_syb
        nv0 = x0.shape[0]
        X_vis[i, nv0: nv0 + len(x_vis)] = x_vis
        Y[i] = y

        ls, q = len(x_syb), q_len
        # symbolic: cross blocks between graph part [0, ls-q) and question [ls-q, ls)
        G_syb[0][i, : ls - q, ls - q: ls] = 1
        G_syb[0][i, ls - q: ls, : ls - q] = 1
        G_syb[1][i, : ls - q, ls - q: ls] = 1
        G_syb[1][i, ls - q: ls, : ls - q] = 1
        G_syb[2][i, ls - q: ls, ls - q: ls] = 1

        lv = len(x_vis)
        G_vis[0][i, :nv0, nv0: nv0 + lv] = 1
        G_vis[0][i, nv0: nv0 + lv, :nv0] = 1
        G_vis[1][i, :nv0, nv0: nv0 + lv] = 1
        G_vis[1][i, nv0: nv0 + lv, :nv0] = 1
        G_vis[2][i, nv0: nv0 + lv, nv0: nv0 + lv] = 1
        if grid_self_connect:  # data_load_args_grid.py:100
            G_vis[2][i, :nv0, :nv0] = 1

        for e in np.asarray(g_syb).reshape(-1, 2) if len(g_syb) else []:
            if e[0] < maxlen and e[1] < maxlen:
                G_syb[0][i, e[0], e[1]] = 1
        for e in np.asarray(g_vis).reshape(-1, 2) if len(g_vis) else []:
            if e[0] < maxlen and e[1] < maxlen:
                G_vis[0][i, e[0], e[1]] = 1

    return ArrayBundle(X_syb, X_vis, Y, tuple(G_syb), tuple(G_vis), x0s)


def get_batch_indices(
    total_length: int, batch_size: int, seed: Optional[int] = None
) -> Iterator[Tuple[List[int], int]]:
    """Shuffled batch-index generator (`data_load.py:155-163`), with an
    explicit seed instead of global random state. The reference's off-by-one
    (it advances before yielding, so the first ``batch_size`` shuffled indices
    are never emitted and the final slice may be short) is preserved."""
    rng = np.random.default_rng(seed)
    idx = list(range(total_length))
    rng.shuffle(idx)
    current = 0
    while True:
        if current + batch_size >= total_length:
            break
        current += batch_size
        yield idx[current: current + batch_size], current

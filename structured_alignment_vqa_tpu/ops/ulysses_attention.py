"""Ulysses-style (all-to-all head-sharded) sequence-parallel graph attention.

The measured alternative to the ppermute ring (`ops/ring_attention.py`) for
SURVEY.md §2.5's sequence-parallel axis. Instead of rotating K/V blocks
around the ring, two ``all_to_all`` collectives re-partition the *heads*:

    in:  (B, L/n, C)   sequence-sharded  (what the data layout gives us)
    ->   (B, L, C/n)   head-sharded      (all_to_all: split channels, gather seq)
    run the single-device flash kernel on H/n heads over the FULL sequence
    ->   (B, L/n, C)   back              (all_to_all: split seq, gather channels)

No online-softmax merging across devices is needed — each device owns whole
heads — so the single-device kernel runs unmodified (custom_vjp and all),
and the backward is the transpose of the same two collectives, which JAX
derives automatically. Constraints: ``num_heads % n == 0`` and ``L % n == 0``.

Trade-offs vs the ring (measured + analyzed in docs/DESIGN.md):

* comm volume: Ulysses moves 4·(B·L/n·C)·(n-1)/n per call (q, k, v in; out
  back) on all-to-all links; the ring moves ~2·(B·L/n·C)·(n-1) (K and V to
  every shard) + masks forward and 2 more accumulator rounds backward —
  O(1/n) vs O(1) of the global sequence per device: Ulysses wins comm by
  roughly the head count.
* memory: the ring keeps the adjacency *row-sharded* (O(L²/n) per device);
  Ulysses needs the full (B, L, L) graph on every device — at the obj+rel
  regime the graph dominates HBM, which is exactly why the ring is the
  default and Ulysses the measured alternative.
* scaling limit: Ulysses cannot exceed n = num_heads (8 here); the ring
  scales to any n dividing L.

Reference anchor: the regime is `modules.py:210-311` at maxlen 1600
(`submit.py:87`); the reference has no sequence parallelism at all.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
    flash_graph_attention,
)
from structured_alignment_vqa_tpu.ops.ring_attention import _interpret


def ulysses_graph_attention(q, k, v, key_mask, query_mask, graph,
                            num_heads: int, renorm: str, mesh,
                            seq_axis: str = "seq", batch_axis: str = "data",
                            q_tile: int = 128, k_tile: Optional[int] = None,
                            interpret: Optional[bool] = None):
    """shard_map wrapper: global (B, L, C) arrays in, all-to-all inside.

    The sequence dim shards over ``seq_axis`` on entry/exit (same layout the
    ring uses, so the two are drop-in interchangeable); the graph and the
    content masks are seq-replicated inside (their in_specs keep the batch
    sharding only) — the all-to-all path needs full-sequence masks and
    adjacency on every device.
    """
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[seq_axis]
    l = q.shape[1]
    if l % n:
        raise ValueError(f"Ulysses needs L={l} divisible by '{seq_axis}'={n}")
    if num_heads % n:
        raise ValueError(
            f"Ulysses shards heads: num_heads={num_heads} must divide by "
            f"'{seq_axis}'={n} (use the ring for n > num_heads)"
        )
    interp = _interpret(interpret)

    def fn(q, k, v, km, qm, g):
        h_loc = num_heads // n

        def to_heads(x):
            # (B, L/n, C) -> (B, L, C/n): device j keeps channel chunk j
            # (= heads [j*h_loc, (j+1)*h_loc) in the kernel's channel-chunk
            # head layout) and gathers every device's sequence rows, which
            # concatenate in device order = global order. tiled=True — the
            # tiled=False form's transpose rule miscompiles on jax 0.9.
            return jax.lax.all_to_all(
                x, seq_axis, split_axis=2, concat_axis=1, tiled=True
            )

        out = flash_graph_attention(
            to_heads(q), to_heads(k), to_heads(v), km, qm, g, h_loc, renorm,
            q_tile=q_tile, k_tile=k_tile, interpret=interp,
        )
        # (B, L, C/n) -> (B, L/n, C): exact transpose of to_heads
        return jax.lax.all_to_all(
            out, seq_axis, split_axis=1, concat_axis=2, tiled=True
        )

    row = P(batch_axis, seq_axis, None)
    rep = P(batch_axis)           # seq-replicated: full-L masks / graph
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(row, row, row, rep, rep, P(batch_axis, None, None)),
        out_specs=row,
        check_vma=False,
    )(q, k, v, key_mask, query_mask, graph)

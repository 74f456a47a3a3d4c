"""The device batch: a pytree mirroring the reference collate outputs.

Field-for-field equivalent of the 12-tensor dict built by
`data_loader_itp_bbox_super_node_onlyobj.py:341-445` (plus the four relation
tensors of the only_obj=False twin, `data_loader_itp_bbox_super_node.py:430-497`),
with one addition: ``sample_valid`` replaces the reference's collate-time
None-filtering (`:342`) so the batch dimension stays static for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class VQABatch:
    # Visual branch
    vis_fea: jax.Array        # (B, Lv, 2048) float  — region features
    vis_mask: jax.Array       # (B, Lv, Lv) 0/1      — per-sample validity square
    # Question graph
    q_ipt: jax.Array          # (B, Lq) int          — GloVe vocab ids
    q_mask: jax.Array         # (B, Lq, Lq) 0/1
    q_graph: jax.Array        # (B, Lq, Lq) 0/1      — word-node adjacency
    # Symbolic (macro) graph
    macro_ipt: jax.Array      # (B, Ls) int          — super/attr/pos/rel node ids
    macro_mask: jax.Array     # (B, Ls, Ls) 0/1
    macro_graph: jax.Array    # (B, Ls, Ls) 0/1      — scene-graph adjacency
    macro_obj_loc: jax.Array  # (B, O) int           — object-slot -> macro row, -1 pad
    # MIL-NCE object candidates
    micro_pos_obj: jax.Array  # (B, O, topN) int
    micro_neg_obj: jax.Array  # (B, O, topN) int
    micro_obj_mask: jax.Array  # (B, O, topN) 0/1
    # MIL-NCE relation candidates (only_obj=False; zero-size R otherwise)
    micro_pos_rel: jax.Array   # (B, R) int
    micro_neg_rel: jax.Array   # (B, R) int
    micro_pos_rel_loc: jax.Array  # (B, R, 5) int — [obj_i, obj_j, rel_cat, macro_loc, micro_loc]
    micro_neg_rel_loc: jax.Array  # (B, R, 5) int
    # Supervision. Unpacked: (B,). Packed: (B, K) with one entry per pack slot.
    answer: jax.Array         # int — 0 = out-of-vocab answer
    sample_valid: jax.Array   # 0/1 — static-shape replacement for None-dropping

    # ---- sequence packing (optional; None on unpacked batches) -------------
    # Multiple short samples share one row. Per-token segment ids (-1 = pad)
    # drive block-isolation of the stage graphs; per-token positions restart
    # at each segment so learned PEs see each sub-sample as if it were alone.
    # The reference has no equivalent (its collate pads every sample to the
    # batch max, `...onlyobj.py:341-445`); packing removes that padding waste
    # on TPU where shapes must be static anyway.
    vis_seg: jax.Array | None = None    # (B, Lv) int
    macro_seg: jax.Array | None = None  # (B, Ls) int
    q_seg: jax.Array | None = None      # (B, Lq) int
    vis_pos: jax.Array | None = None    # (B, Lv) int — PE position per token
    macro_pos: jax.Array | None = None  # (B, Ls) int
    q_pos: jax.Array | None = None      # (B, Lq) int — local (pre-offset) position

    @property
    def batch_size(self) -> int:
        return self.vis_fea.shape[0]

    @property
    def n_pack(self) -> int:
        """Pack slots per row (1 = unpacked)."""
        return 1 if self.answer.ndim == 1 else self.answer.shape[1]


def zeros_batch(
    batch: int,
    lv: int = 6,
    lq: int = 5,
    ls: int = 9,
    topn: int = 2,
    n_rel: int = 4,
    fea_dim: int = 2048,
    pad_id: int = 400000,
) -> VQABatch:
    """An all-padding batch with the right dtypes/shapes (compile probes, tests)."""
    f32 = np.float32
    i32 = np.int32
    return VQABatch(
        vis_fea=jnp.zeros((batch, lv, fea_dim), f32),
        vis_mask=jnp.zeros((batch, lv, lv), i32),
        q_ipt=jnp.full((batch, lq), pad_id, i32),
        q_mask=jnp.zeros((batch, lq, lq), i32),
        q_graph=jnp.zeros((batch, lq, lq), i32),
        macro_ipt=jnp.full((batch, ls), pad_id, i32),
        macro_mask=jnp.zeros((batch, ls, ls), i32),
        macro_graph=jnp.zeros((batch, ls, ls), i32),
        macro_obj_loc=jnp.full((batch, lv), -1, i32),
        micro_pos_obj=jnp.full((batch, lv, topn), pad_id, i32),
        micro_neg_obj=jnp.full((batch, lv, topn), pad_id, i32),
        micro_obj_mask=jnp.zeros((batch, lv, topn), i32),
        micro_pos_rel=jnp.full((batch, n_rel), pad_id, i32),
        micro_neg_rel=jnp.full((batch, n_rel), pad_id, i32),
        micro_pos_rel_loc=jnp.full((batch, n_rel, 5), -1, i32),
        micro_neg_rel_loc=jnp.full((batch, n_rel, 5), -1, i32),
        answer=jnp.zeros((batch,), i32),
        sample_valid=jnp.ones((batch,), i32),
    )

"""Sequence packing: multiple short samples share one static-shape row.

The reference pads every sample to the batch max (`data_loader_itp_bbox_super_
node_onlyobj.py:341-445`); the TPU build pads to fixed lane-aligned buckets
(`data/dataset.py`), which measured ~25% padding waste at the production
bucket mix (docs/DESIGN.md). Packing fills that waste with real samples:

* each packed row carries up to ``n_pack`` samples, laid out contiguously in
  the visual / macro / question token axes;
* per-token **segment ids** drive exact isolation in the model: every stage
  graph is multiplied by the segment-equality matrix, and the graph-guided
  attention's L1 renorm cancels the softmax normalizer, so cross-segment keys
  contribute exactly nothing (`models/att_model_x3.py:build_stage_graphs`);
* per-token **positions** restart at every segment, giving *tight-bucket*
  semantics: a packed sub-sample computes exactly what it would compute
  collated alone with zero padding (tested in tests/test_packing.py).
  Note this intentionally differs from unpacked padded rows, where the
  reference's `graph = 1 - mask` cross stage lets valid tokens attend
  PAD-embedding padding tokens (`AttModel_x3.py:118-122`) — an artifact of
  bucket size, not model semantics, which packing removes;
* the decoder gets one BOS token per pack slot; answers/validity become
  (B, n_pack).

Only the production ``only_obj=True`` configuration packs: the relation-MIL
branch's compacted-softmax indexing (`AttModel_x3.py:420-436`) is defined over
per-sample record positions and does not compose across packed segments.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from structured_alignment_vqa_tpu.data.batch import VQABatch
from structured_alignment_vqa_tpu.data.dataset import (
    LOC_PAD,
    PAD,
    BatchShape,
    Sample,
    _scatter_edges,
)

# shared position ramp: per-sample np.arange allocations were a measured
# hot spot in the cached-epoch collate (docs/DESIGN.md round 3)
_RAMP = np.arange(8192, dtype=np.int32)


@dataclasses.dataclass
class PackedRow:
    """An open row accumulating samples under a BatchShape capacity."""

    shape: BatchShape
    n_pack: int
    samples: List[Sample] = dataclasses.field(default_factory=list)
    vis_used: int = 0
    macro_used: int = 0
    q_used: int = 0

    def fits(self, s: Sample) -> bool:
        return (
            len(self.samples) < self.n_pack
            and self.vis_used + s.vis_fea.shape[0] <= self.shape.lv
            and self.macro_used + len(s.macro_ids) <= self.shape.ls
            and self.q_used + len(s.q_ids) <= self.shape.lq
        )

    def add(self, s: Sample) -> None:
        self.samples.append(s)
        self.vis_used += s.vis_fea.shape[0]
        self.macro_used += len(s.macro_ids)
        self.q_used += len(s.q_ids)


def collate_packed(
    groups: Sequence[Optional[Sequence[Sample]]],
    shape: BatchShape,
    topn: int,
    n_pack: int,
    fea_dim: int = 2048,
) -> VQABatch:
    """Pack each group of samples into one row of ``shape``.

    Group capacity (sum of lengths per axis, group size <= n_pack) must have
    been checked by the caller (`PackedRow.fits`); a None group is an
    all-invalid row.
    """
    b = len(groups)
    lv, ls, lq = shape.lv, shape.ls, shape.lq

    vis = np.zeros((b, lv, fea_dim), np.float32)
    vis_mask = np.zeros((b, lv, lv), np.int8)
    vis_seg = np.full((b, lv), -1, np.int32)
    vis_pos = np.zeros((b, lv), np.int32)
    macro = np.full((b, ls), PAD, np.int32)
    macro_mask = np.zeros((b, ls, ls), np.int8)
    macro_graph = np.zeros((b, ls, ls), np.int8)
    macro_seg = np.full((b, ls), -1, np.int32)
    macro_pos = np.zeros((b, ls), np.int32)
    obj_loc = np.full((b, lv), LOC_PAD, np.int32)
    mpos = np.full((b, lv, topn), PAD, np.int32)
    mneg = np.full((b, lv, topn), PAD, np.int32)
    mmask = np.zeros((b, lv, topn), np.int8)
    q = np.full((b, lq), PAD, np.int32)
    q_mask = np.zeros((b, lq, lq), np.int8)
    q_graph = np.zeros((b, lq, lq), np.int8)
    q_seg = np.full((b, lq), -1, np.int32)
    q_pos = np.zeros((b, lq), np.int32)
    answer = np.zeros((b, n_pack), np.int32)
    valid = np.zeros((b, n_pack), np.int32)

    for i, group in enumerate(groups):
        if not group:
            continue
        vo = mo = qo = 0  # running offsets per axis
        for k, s in enumerate(group):
            no = s.vis_fea.shape[0]
            nm = len(s.macro_ids)
            nq = len(s.q_ids)
            vis[i, vo:vo + no] = s.vis_fea
            vis_mask[i, vo:vo + no, vo:vo + no] = 1
            vis_seg[i, vo:vo + no] = k
            vis_pos[i, vo:vo + no] = _RAMP[:no]
            macro[i, mo:mo + nm] = s.macro_ids
            macro_mask[i, mo:mo + nm, mo:mo + nm] = 1
            _scatter_edges(macro_graph[i, mo:mo + nm, mo:mo + nm], s.macro_edges, nm)
            macro_seg[i, mo:mo + nm] = k
            macro_pos[i, mo:mo + nm] = _RAMP[:nm]
            n_obj = min(len(s.obj_locs), no)
            obj_loc[i, vo:vo + n_obj] = s.obj_locs[:n_obj] + mo
            mpos[i, vo:vo + s.micro_pos_obj.shape[0]] = s.micro_pos_obj
            mneg[i, vo:vo + s.micro_neg_obj.shape[0]] = s.micro_neg_obj
            mmask[i, vo:vo + n_obj] = 1
            q[i, qo:qo + nq] = s.q_ids
            _scatter_edges(q_graph[i, qo:qo + nq, qo:qo + nq], s.q_edges, nq)
            q_mask[i, qo:qo + nq, qo:qo + nq] = 1
            q_seg[i, qo:qo + nq] = k
            q_pos[i, qo:qo + nq] = _RAMP[:nq]
            answer[i, k] = s.answer
            valid[i, k] = 1
            vo += no
            mo += nm
            qo += nq

    return VQABatch(
        vis_fea=vis,
        vis_mask=vis_mask,
        q_ipt=q,
        q_mask=q_mask,
        q_graph=q_graph,
        macro_ipt=macro,
        macro_mask=macro_mask,
        macro_graph=macro_graph,
        macro_obj_loc=obj_loc,
        micro_pos_obj=mpos,
        micro_neg_obj=mneg,
        micro_obj_mask=mmask,
        micro_pos_rel=np.full((b, 1), PAD, np.int32),
        micro_neg_rel=np.full((b, 1), PAD, np.int32),
        micro_pos_rel_loc=np.full((b, 1, 5), LOC_PAD, np.int32),
        micro_neg_rel_loc=np.full((b, 1, 5), LOC_PAD, np.int32),
        answer=answer,
        sample_valid=valid,
        vis_seg=vis_seg,
        macro_seg=macro_seg,
        q_seg=q_seg,
        vis_pos=vis_pos,
        macro_pos=macro_pos,
        q_pos=q_pos,
    )

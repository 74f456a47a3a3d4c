"""Primitive ops: the TPU-native equivalents of the reference's `models/modules.py`.

Functional cores live in `attention.py` / `layers.py` / `mil_nce.py` / `mcb.py`;
parameterized flax wrappers of the attention family are in `attention.py` too.
The fused Pallas kernel for graph-guided attention is in `pallas_attention.py`
with the XLA composite implementation as fallback/reference.
"""

from structured_alignment_vqa_tpu.ops.layers import (
    layer_norm,
    label_smoothing,
    sinusoidal_position_encoding,
    LayerNorm,
    FeedForward,
    Embedding,
)
from structured_alignment_vqa_tpu.ops.attention import (
    content_mask,
    attention_core,
    MultiHeadAttention,
    GraphGuidedAttention,
    GraphMaskAttention,
)
from structured_alignment_vqa_tpu.ops.mil_nce import (
    masked_logsumexp,
    mil_nce_obj_objective,
    mil_nce_rel_objective,
    compact_softmax_gather,
)
from structured_alignment_vqa_tpu.ops.mcb import count_sketch_matrix, compact_bilinear_pooling

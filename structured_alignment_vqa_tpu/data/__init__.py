"""Host data pipeline: vocab, synonym normalization, scene-graph -> super-node
construction, indexed tar IO, and static-shape batching.

TPU-native redesign of the reference loader family (`SURVEY.md` section 2.3):
tar archives are indexed once (optionally by the C++ tier in `native/`),
samples that the reference would drop (`return None`) instead carry a validity
flag so batch shapes stay static, and padding uses a small set of shape
buckets instead of per-batch dynamic maxima, so XLA compiles a handful of
programs instead of one per batch shape.
"""

from structured_alignment_vqa_tpu.data.batch import VQABatch
from structured_alignment_vqa_tpu.data.vocab import load_graph_vocab, load_answer_vocab

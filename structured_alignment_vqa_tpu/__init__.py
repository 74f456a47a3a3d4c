"""structured_alignment_vqa_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of SA-VQA (Structured Alignment of Visual and Semantic Representations
for Visual Question Answering, arXiv 2201.10654).

This is a ground-up rebuild, not a port: the compute path is JAX/XLA with fused
Pallas kernels for the graph-guided attention; parallelism is expressed as
`jax.sharding.Mesh` + `shard_map`/GSPMD shardings instead of NCCL DDP; the host
data pipeline uses an indexed, prefetching tar reader (C++ tier) and bucketed
static padding instead of per-item tar re-opens and dynamic batch shapes.

Layer map (mirrors SURVEY.md section 1 of this repo):
  ops/       - primitive ops (attention family, layernorm, ffn, MIL-NCE, MCB)
  models/    - model families (AttModelX3 flagship + variant matrix)
  data/      - host pipeline (vocab, graph construction, tar IO, batching)
  parallel/  - mesh construction, sharded train/eval steps
  train/     - drivers (CLI, train loop, eval, checkpointing)
  utils/     - metrics, logging, profiling helpers
  native/    - C++ tier (indexed tar reader) with ctypes bindings
"""

__version__ = "0.1.0"

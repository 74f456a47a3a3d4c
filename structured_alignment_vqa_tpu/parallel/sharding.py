"""Sharding rules: map parameters and batches onto the mesh.

Rules are deliberately conservative — GSPMD only needs layout *hints*; anything
unannotated is replicated and XLA still produces a correct program. The big
wins for this model:

* the 407k x 300 GloVe tables (up to three copies, ~0.5 GB each in f32) shard
  their vocab dimension over the model axis;
* FFN kernels (d x 4d / 4d x d) and classifier output kernels shard their wide
  dimension (Megatron-style column/row split);
* every batch tensor shards its leading (batch) dimension over the data axis.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from structured_alignment_vqa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Vocab dimension below this size is not worth sharding.
_MIN_SHARD_DIM = 1024


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_pspec(path, value, model_axis_size: int) -> P:
    """PartitionSpec for one parameter."""
    name = _path_str(path)
    shape = value.shape
    if model_axis_size <= 1:
        return P()
    # GloVe / embedding tables: shard the vocab dimension. int8-serving
    # tables (`ops/quant.py`) shard identically; their per-row scales follow
    # the same vocab split.
    if name.endswith(("table", "lookup_table", "table_q")):
        if shape[0] >= _MIN_SHARD_DIM and shape[0] % model_axis_size == 0:
            return P(MODEL_AXIS, None)
        return P()
    if name.endswith("table_scale"):
        if shape[0] >= _MIN_SHARD_DIM and shape[0] % model_axis_size == 0:
            return P(MODEL_AXIS)
        return P()
    if name.endswith(("kernel", "kernel_q")) and len(shape) == 2:
        # Column-split the expanding FFN / head kernels, row-split contracting.
        if shape[1] >= shape[0] and shape[1] % model_axis_size == 0 and shape[1] >= 4 * model_axis_size:
            return P(None, MODEL_AXIS)
        if shape[0] > shape[1] and shape[0] % model_axis_size == 0 and shape[0] >= 4 * model_axis_size:
            return P(MODEL_AXIS, None)
        return P()
    return P()


def param_sharding_rules(params: Any, mesh: Mesh):
    """Pytree of NamedShardings matching ``params``."""
    size = mesh.shape[MODEL_AXIS]

    def rule(path, value):
        return NamedSharding(mesh, param_pspec(path, value, size))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh):
    """Device-put params according to the rules."""
    return jax.device_put(params, param_sharding_rules(params, mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Every batch tensor shards dim 0 over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

"""Parallelism: device meshes, sharding rules, and the sharded train/eval steps.

TPU-native replacement for the reference's distributed runtime
(`main_itp_ddp_tar_super_node.py:153-158,202-203,383-404`): instead of NCCL
process groups + DDP gradient hooks + explicit ``dist.all_gather`` of metric
triples, we lay out a `jax.sharding.Mesh`, annotate batch/param shardings, and
let XLA GSPMD insert the gradient reductions and metric psums over ICI.
"""

from structured_alignment_vqa_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from structured_alignment_vqa_tpu.parallel.sharding import (
    param_sharding_rules,
    batch_sharding,
    shard_params,
)
from structured_alignment_vqa_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)

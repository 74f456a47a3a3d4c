"""Device mesh construction.

The mesh has two logical axes:

* ``data``  — batch sharding (the reference's only parallelism: DDP over NCCL,
              `main_itp_ddp_tar_super_node.py:202-203`);
* ``model`` — tensor sharding of the large embedding tables / FFN kernels.
              The reference has no TP (SURVEY.md section 2.5); the axis exists so
              scaling beyond pure DP is a mesh reshape, not a rewrite.

Within one slice both axes ride ICI; across slices the data axis maps to DCN
(the standard "DP outer, TP inner" layout).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    seq_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, seq, model) mesh over the first ``n_devices`` devices.

    ``model_parallel=seq_parallel=1`` degenerates to pure data parallelism
    (the reference's regime). ``seq_parallel>1`` shards the encoder token
    sequence for ring attention (`ops/ring_attention.py` — SURVEY.md §5.7's
    ICI ring, which the reference never had). The model axis is innermost so
    tensor-parallel collectives ride the fastest ICI links; seq sits between
    data and model so ring ppermutes stay within a slice.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh asked for {n_devices} devices but only {len(devs)} "
                f"exist ({[d.platform for d in devs]}). For a virtual CPU mesh "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                "jax.config.update('jax_platforms','cpu') before any jax call."
            )
        devs = devs[:n_devices]
    n = len(devs)
    inner = model_parallel * seq_parallel
    if n % inner:
        raise ValueError(
            f"{n} devices not divisible by seq_parallel*model_parallel={inner}"
        )
    grid = np.asarray(devs).reshape(n // inner, seq_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def fitting_mesh(
    batch_size: int, model_parallel: int = 1, seq_parallel: int = 1
) -> Mesh:
    """Largest mesh whose data axis divides ``batch_size``.

    Small debug batches (the reference's ``--local_debug`` regime) must not
    force an 8-way shard of a batch of 4; production batch sizes use every
    device.
    """
    n = len(jax.devices())
    inner = model_parallel * seq_parallel
    data_ax = max(n // inner, 1)
    while data_ax > 1 and batch_size % data_ax:
        data_ax -= 1
    used = data_ax * inner
    if used < n:
        import warnings

        warnings.warn(
            f"fitting_mesh: batch_size={batch_size} with model_parallel="
            f"{model_parallel}, seq_parallel={seq_parallel} uses only {used} "
            f"of {n} devices ({n - used} idle). Pick a batch size divisible "
            f"by {n // inner} to use every device.",
            stacklevel=2,
        )
    return make_mesh(
        n_devices=used, model_parallel=model_parallel, seq_parallel=seq_parallel
    )

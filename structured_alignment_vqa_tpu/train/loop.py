"""The training loop.

Mirrors the reference epoch structure (`main_itp_ddp_tar_super_node.py:261-428`):
per-epoch train pass, eval on val AND train loaders, metric aggregation,
per-epoch checkpoint — with the TPU-native substitutions:

* DDP/NCCL -> GSPMD mesh (gradient psum inside the jitted step);
* ``dist.all_gather`` of metric triples -> metric sums already global;
* save-only .pth -> orbax save + resume;
* Azure Run.log -> JSONL metric sink.
"""

from __future__ import annotations

import dataclasses
import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from structured_alignment_vqa_tpu.data.dataset import BatchLoader, DataConfig, GQASuperNodeDataset
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import ModelConfig
from structured_alignment_vqa_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from structured_alignment_vqa_tpu.parallel.mesh import fitting_mesh
from structured_alignment_vqa_tpu.parallel.train_step import adam, put_batch, shard_state
from structured_alignment_vqa_tpu.utils.checkpoint import (
    latest_epoch,
    restore_checkpoint,
    save_checkpoint,
)
from structured_alignment_vqa_tpu.utils.logging import MetricLogger, setup_logging
from structured_alignment_vqa_tpu.utils.metrics import AverageMeter
from structured_alignment_vqa_tpu.utils.profiling import StepTimer


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str = "./tmp"
    batch_size: int = 32
    lr: float = 1e-4
    num_epochs: int = 40
    log_steps: int = 100
    log_steps_val: int = 100
    with_milnce: bool = True
    with_smooth_labeling: bool = True  # v3 loss always smooths (`main:334-345`)
    model_parallel: int = 1
    seed: int = 0
    resume: bool = True
    checkpoint_every: int = 1
    max_checkpoints: Optional[int] = None
    num_workers: int = 8
    num_procs: int = 0  # loader worker processes (0 = thread pool)
    # >1: sequence packing — up to n_pack training samples share one
    # static-shape row (data/packing.py); eval then runs one-sample-per-row
    # through the same tight collate (tight=True) so train and eval see
    # identical per-sample encodings (PE restart, no padding attendance).
    n_pack: int = 1
    # bucket index packed rows use (None = largest). At the production
    # obj-only mix the measured optimum is the middle (256-combined-token)
    # bucket at full batch size: +35% samples/s (docs/DESIGN.md).
    pack_bucket: Optional[int] = None
    # cross-epoch preprocessed-sample cache root (data/sample_cache.py);
    # train and val get separate subdirectories. None = rebuild each epoch
    # (the reference's behavior).
    cache_dir: Optional[str] = None
    # materialize epoch-0's collated train batches and replay them mmap'd in
    # a per-epoch-shuffled ORDER (composition frozen; data/dataset.py
    # "batch_replay_dir"). Requires cache_dir for the on-disk root.
    batch_replay: bool = False
    # capture a JAX profiler trace of training steps [profile_start, profile_start
    # + profile_steps) into <output_dir>/profile (SURVEY.md section 5.1: the reference
    # had no profiling at all)
    profile_steps: int = 0
    profile_start: int = 10
    # epochs between the per-epoch val+train eval passes (`main:380-382` evals
    # every epoch; >1 skips intermediates — the final epoch always evals)
    eval_every: int = 1
    # linear LR warmup over this many steps, then the constant reference LR
    # (0 = plain Adam, the reference's schedule-free behavior, `main:206`)
    warmup_steps: int = 0
    # sparse/segmented Adam for the shared GloVe table: only the rows a batch
    # touches are read/updated (parallel/sparse_table.py). Lazy-Adam
    # semantics (untouched rows do not decay their moments) — opt-in with a
    # tested, bounded trajectory deviation vs the reference's dense Adam.
    # Requires model_cfg.share_glove.
    sparse_table: bool = False
    # store the sparse table's Adam moments in bfloat16 (halves their HBM)
    table_moments_bf16: bool = False
    # Device-resident frozen batches: once batch_replay (train) / the val
    # batch cache has materialized, ship every batch to HBM ONCE and train/
    # eval from residency — per-epoch order still reshuffles. Set for remote
    # -TPU tunnels, where each device_put is slow (~3 s per bs-128 batch
    # measured) AND leaks its host staging buffer in the plugin (~70 MB per
    # put — a 40-epoch streamed run OOMs a 125 GB host). This is the budget
    # in GB of device memory the batches may occupy; 0 disables (stream).
    resident_gb: float = 8.0


def run_eval(eval_step, state, loader, logger, log_steps, tag="",
             metric_lag: int = 4):
    """Eval pass; returns (avg_loss, n_correct, n) — already global sums
    (replacing `main:380-404`).

    Metric fetches are deferred ``metric_lag`` batches: reading a metric
    scalar blocks on that batch's whole computation, and doing it on the
    *current* batch serializes every dispatch behind a device round trip
    (measured 1.75 s/step through the remote-TPU tunnel vs ~0.1 s compute).
    Reading a ``metric_lag``-old metric is free — it finished while later
    batches were dispatched.
    """
    from collections import deque

    loss_meter = AverageMeter()
    mil_meter = AverageMeter()
    n_correct = 0.0
    n_total = 0.0
    pending: deque = deque()

    def drain(i, m):
        nonlocal n_correct, n_total
        n = float(m["n"])
        if n > 0:
            loss_meter.update(float(m["loss_sum"]) / n, int(n))
            mil_meter.update(float(m["mil_sum"]) / n, int(n))
        n_correct += float(m["n_correct"])
        n_total += n
        if (i + 1) % log_steps == 0:
            logger.info(
                "Time %s, %s Step [%d], Avg Loss: %s, Avg MILNCE_loss: %s",
                datetime.datetime.now(), tag, i + 1, loss_meter.avg, mil_meter.avg,
            )

    for i, batch in enumerate(loader):
        pending.append((i, eval_step(state, batch)))
        if len(pending) > metric_lag:
            drain(*pending.popleft())
    while pending:
        drain(*pending.popleft())
    return loss_meter.avg, n_correct, n_total


def train(
    model_cfg: ModelConfig,
    data_cfg: DataConfig,
    trainer_cfg: TrainerConfig,
    val_data_cfg: Optional[DataConfig] = None,
    glove_table: Optional[np.ndarray] = None,
):
    """Full training run; returns the final TrainState."""
    tc = trainer_cfg
    proc = jax.process_index()
    nproc = jax.process_count()
    logger = setup_logging(tc.output_dir, proc)
    metrics_out = MetricLogger(tc.output_dir, proc)

    mesh = fitting_mesh(tc.batch_size, tc.model_parallel)
    logger.info("mesh: %s over %d devices, %d processes", mesh.shape, mesh.size, nproc)

    train_ds = GQASuperNodeDataset("train", data_cfg)
    val_ds = GQASuperNodeDataset("val", val_data_cfg or data_cfg)
    model_cfg = model_cfg.replace(topn=data_cfg.topn, only_obj=data_cfg.only_obj)
    model = AttModelX3(model_cfg)
    tx = adam(tc.lr, warmup_steps=tc.warmup_steps)

    cache = lambda split: f"{tc.cache_dir}/{split}" if tc.cache_dir else None
    if tc.batch_replay and not tc.cache_dir:
        raise ValueError("batch_replay needs cache_dir for its on-disk root")
    train_loader = BatchLoader(
        train_ds, tc.batch_size, shuffle=True, seed=tc.seed,
        shard_idx=proc, num_shards=nproc, num_threads=tc.num_workers,
        num_procs=tc.num_procs, n_pack=tc.n_pack, pack_bucket=tc.pack_bucket,
        cache_dir=cache("train"),
        batch_replay_dir=cache("train_batches") if tc.batch_replay else None,
    )
    # when training packs (tight per-sample semantics: PE restart, no
    # padding-token attendance), eval must see the same encodings —
    # tight=True routes single samples through the packed collate so
    # train and eval match (ADVICE r2); unpacked training keeps the
    # reference's padded semantics on both sides.
    val_loader = BatchLoader(
        val_ds, tc.batch_size, shuffle=False,
        shard_idx=proc, num_shards=nproc, num_threads=tc.num_workers,
        num_procs=tc.num_procs, tight=tc.n_pack > 1,
        cache_dir=cache("val"),
        # val order is fixed, so epochs 2+ stream materialized collated
        # batches (data/batch_cache.py) — per-epoch val eval stops paying
        # the host pipeline at all
        batch_cache_dir=cache("val_batches"),
    )

    # init from the first available batch (defines bucket shapes are per-batch;
    # params are shape-independent)
    probe = next(iter(BatchLoader(
        train_ds, tc.batch_size, shuffle=False, num_threads=tc.num_workers
    )))
    state = create_train_state(
        model, jax.random.key(tc.seed), probe, tx,
        sparse_table=tc.sparse_table,
        table_moments_dtype=jnp.bfloat16 if tc.table_moments_bf16 else jnp.float32,
    )

    if glove_table is not None:
        state = state.replace(params=graft_glove(state.params, glove_table))

    start_epoch = 0
    ckpt_dir = f"{tc.output_dir}/checkpoints"
    if tc.resume and latest_epoch(ckpt_dir) is not None:
        state, start_epoch = restore_checkpoint(ckpt_dir, state)
        logger.info("resumed from epoch %d", start_epoch)

    state = shard_state(state, mesh)
    train_step = make_train_step(
        model, tx, model_cfg, with_milnce=tc.with_milnce,
        sparse_table=tc.sparse_table, table_lr=tc.lr,
        table_warmup_steps=tc.warmup_steps,
    )
    # f32 features ship as bf16 when the model computes in bf16 (exact:
    # the step's own cast rounds identically — data/wire.py)
    bf16_wire = model_cfg.compute_dtype == jnp.bfloat16
    eval_step = make_eval_step(model, model_cfg, with_milnce=tc.with_milnce)
    rng = jax.random.key(tc.seed + 1)
    timer = StepTimer()

    # device-resident frozen batches (see TrainerConfig.resident_gb): pinned
    # lazily, the first epoch after the corresponding cache materializes
    resident_budget = tc.resident_gb * 1e9
    resident_train = resident_val = None

    for epoch in range(start_epoch, tc.num_epochs):
        train_loader.set_epoch(epoch)
        if tc.batch_replay and resident_train is None and resident_budget > 0:
            resident_train = _make_resident(
                train_loader, mesh, bf16_wire, resident_budget, logger)
            if resident_train is not None:
                resident_budget -= resident_train[1]
        loss_meter, mil_meter = AverageMeter(), AverageMeter()

        tracing = False
        # Deferred metric fetches (same rationale as run_eval): reading the
        # current step's loss blocks the dispatch pipeline on a full device
        # round trip per step. Metrics are read metric_lag steps late, when
        # they are already resident; log lines report the step they belong to.
        from collections import deque

        metric_lag = 4
        pending: deque = deque()

        def drain(i, m):
            bsz = int(m["n"])
            if bsz:
                loss_meter.update(float(m["loss"]), bsz)
                mil_meter.update(float(m["mil_nce_loss"]), bsz)
            sps = timer.tick()
            if proc == 0 and (i + 1) % tc.log_steps == 0:
                logger.info(
                    "Time %s, Epoch [%d/%d], Step [%d], Loss: %s, MIL NCE Loss: %s, "
                    "Avg Loss: %s, Avg MILNCE_loss: %s, steps/s: %s",
                    datetime.datetime.now(), epoch + 1, tc.num_epochs, i + 1,
                    float(m["loss"]), float(m["mil_nce_loss"]),
                    loss_meter.avg, mil_meter.avg, sps,
                )
                metrics_out.log("Avg Loss", loss_meter.avg, int(state.step))
                metrics_out.log("Avg MILNCE_loss", mil_meter.avg, int(state.step))

        if resident_train is not None:
            batches = (resident_train[0][int(j)] for j in
                       train_loader.replay_order(epoch, len(resident_train[0])))
        else:
            batches = _mesh_iter(train_loader, mesh, bf16_features=bf16_wire)
        for i, batch in enumerate(batches):
            if tc.profile_steps and proc == 0 and epoch == start_epoch:
                if i == tc.profile_start:
                    jax.profiler.start_trace(f"{tc.output_dir}/profile")
                    tracing = True
                elif tracing and i == tc.profile_start + tc.profile_steps:
                    jax.profiler.stop_trace()
                    tracing = False
            state, m = train_step(state, batch, rng)
            pending.append((i, m))
            if len(pending) > metric_lag:
                drain(*pending.popleft())
        while pending:
            drain(*pending.popleft())

        if tracing:  # epoch shorter than the requested window
            jax.profiler.stop_trace()

        # per-epoch eval on val and train (`main:380-382`); eval_every > 1
        # skips intermediate epochs (the final epoch always evals)
        if (epoch + 1) % tc.eval_every and epoch + 1 != tc.num_epochs:
            if (epoch + 1) % tc.checkpoint_every == 0:
                save_checkpoint(ckpt_dir, state, epoch + 1, tc.max_checkpoints)
            continue
        if resident_val is None and resident_budget > 0:
            # materializes on the first (streamed) val pass, resident after
            resident_val = _make_resident(
                val_loader, mesh, bf16_wire, resident_budget, logger)
            if resident_val is not None:
                resident_budget -= resident_val[1]
        val_loss, val_corr, val_n = run_eval(
            eval_step, state,
            iter(resident_val[0]) if resident_val is not None
            else _mesh_iter(val_loader, mesh, bf16_features=bf16_wire),
            logger, tc.log_steps_val, "val")
        # train eval reuses the resident replay batches — identical content,
        # and eval order does not affect the psum'd metrics
        train_loss, tr_corr, tr_n = run_eval(
            eval_step, state,
            iter(resident_train[0]) if resident_train is not None
            else _mesh_iter(train_loader, mesh, bf16_features=bf16_wire),
            logger, tc.log_steps, "train")

        if proc == 0:
            val_acc = val_corr / max(val_n, 1)
            train_acc = tr_corr / max(tr_n, 1)
            logger.info(
                "Time %s, Epoch [%d/%d], Val Loss: %s, accuracy: %s/%s = %s",
                datetime.datetime.now(), epoch + 1, tc.num_epochs, val_loss,
                val_corr, val_n, val_acc,
            )
            logger.info(
                "Time %s, Epoch [%d/%d], Train Loss: %s, accuracy: %s/%s = %s",
                datetime.datetime.now(), epoch + 1, tc.num_epochs, train_loss,
                tr_corr, tr_n, train_acc,
            )
            metrics_out.log("Test Acc", val_acc, epoch + 1)
            metrics_out.log("Train Acc", train_acc, epoch + 1)

        if (epoch + 1) % tc.checkpoint_every == 0:
            save_checkpoint(ckpt_dir, state, epoch + 1, tc.max_checkpoints)

    return state


def _make_resident(loader, mesh, bf16_features: bool, budget_bytes: float,
                   logger) -> Optional[list]:
    """Pin a loader's materialized frozen batches device-resident.

    Returns the list of device-side WireBatches (index i = cache batch i),
    or None when there is no valid cache yet or the set exceeds the budget.
    Ships each batch exactly once; afterwards epochs cost zero host->device
    traffic (the per-put plugin leak and the ~23 MB/s tunnel both stop
    mattering). The training step donates only the state, so resident
    batches are reusable across steps and epochs.
    """
    from structured_alignment_vqa_tpu.data.wire import pack_wire

    cache = loader.replay_cache()
    if cache is None or budget_bytes <= 0:
        return None
    wires = []
    total = 0
    for i in range(len(cache)):
        w = pack_wire(cache.batch(i), bf16_features=bf16_features)
        total += sum(np.asarray(getattr(w, g)).nbytes for g in ("f32", "i32", "i8"))
        if total > budget_bytes:
            logger.info(
                "resident batches over budget (%.1f GB > %.1f GB) at %d/%d; streaming",
                total / 1e9, budget_bytes / 1e9, i + 1, len(cache),
            )
            return None
        wires.append(w)
    dev = [put_batch(w, mesh) for w in wires]
    logger.info("pinned %d frozen batches device-resident (%.2f GB)",
                len(dev), total / 1e9)
    return dev, total


def _mesh_iter(loader, mesh, prefetch: int = 2, wire: bool = True,
               bf16_features: bool = False):
    """Device-put batches ``prefetch`` ahead of consumption, off-thread.

    Through the remote-TPU tunnel ``jax.device_put`` blocks the calling
    thread for the duration of the copy, so an inline prefetch deque never
    actually overlaps transfer with compute — the put of batch t+2 runs
    *between* the dispatches of steps t and t+1. A single worker thread
    owns pack+put (order-preserving); numpy packing and the transfer both
    release the GIL, so the main thread keeps dispatching steps.

    ``wire``: pack the 18-leaf batch into 3 dtype-grouped arrays before the
    transfer (data/wire.py) — each host->device put pays a fixed per-array
    cost, and 18x that overhead dwarfed the step itself (measured ~750 ms
    vs 123 ms compute, docs/DESIGN.md "Transfer batching"). The jitted step
    unpacks with static slices, which XLA fuses away.

    ``bf16_features``: ship f32 features as bf16 (half the bytes); only
    valid when the model computes in bf16 (see ``pack_wire``).
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from structured_alignment_vqa_tpu.data.wire import pack_wire

    def ship(batch):
        return put_batch(
            pack_wire(batch, bf16_features=bf16_features) if wire else batch,
            mesh,
        )

    with ThreadPoolExecutor(1) as ex:
        buf = deque()
        for batch in loader:
            buf.append(ex.submit(ship, batch))
            if len(buf) >= prefetch:
                yield buf.popleft().result()
        while buf:
            yield buf.popleft().result()


def graft_glove(params, table: np.ndarray):
    """Copy GloVe vectors into every GloVe table parameter (rows [0, n)),
    the post-init analogue of `AttModel_x3.py:38`."""
    def visit(path, leaf):
        name = getattr(path[-1], "key", None)
        if name == "table" and leaf.ndim == 2 and leaf.shape[0] >= table.shape[0]:
            return leaf.at[: table.shape[0]].set(jnp.asarray(table, leaf.dtype))
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)

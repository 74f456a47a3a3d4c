"""Batch serving driver: checkpoint -> answers.

The reference has no inference product beyond its eval loops; this is the
deployment surface the TPU build adds: stream a question tar through the
loader, run the jitted ensemble-argmax predict step, and write
``{"index", "answer_id", "answer"}`` JSONL.

Usage:
    python -m structured_alignment_vqa_tpu.train.predict \
        --data_dir_azure /data/gqa ... --weight_dir out/checkpoints \
        --split val --q_tar_fn_val val.tar --out answers.jsonl
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from structured_alignment_vqa_tpu.data.dataset import BatchLoader, GQASuperNodeDataset
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.parallel import create_train_state
from structured_alignment_vqa_tpu.parallel.mesh import fitting_mesh
from structured_alignment_vqa_tpu.parallel.train_step import adam, put_batch, shard_state
from structured_alignment_vqa_tpu.train.main import build_parser, configs_from_args
from structured_alignment_vqa_tpu.utils.checkpoint import load_params_for_eval
from structured_alignment_vqa_tpu.utils.logging import setup_logging


def make_predict_step(model):
    """Jitted ensemble-argmax (the serving half of `main:335-341`)."""

    @jax.jit
    def predict(state, batch):
        from structured_alignment_vqa_tpu.data.wire import as_vqa_batch

        batch = as_vqa_batch(batch)
        variables = {"params": state.params}
        if state.constants:
            variables["constants"] = state.constants
        lc, lv, ls_, _, _ = model.apply(variables, batch, deterministic=True)
        log_sm = (
            jax.nn.log_softmax(lv.astype(jnp.float32), -1)
            + jax.nn.log_softmax(ls_.astype(jnp.float32), -1)
            + jax.nn.log_softmax(lc.astype(jnp.float32), -1)
        )
        return jnp.argmax(log_sm, axis=-1)

    return predict


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--weight_dir", type=str, required=True)
    parser.add_argument("--weight_epoch", type=int, default=None)
    parser.add_argument("--split", type=str, default="val")
    parser.add_argument("--out", type=str, default="-", help="JSONL path or - for stdout")
    parser.add_argument("--int8", action="store_true",
                        help="weight-only int8 serving: quantize the GloVe "
                             "tables and classifier heads after checkpoint "
                             "load (ops/quant.py)")
    parser.add_argument("--batch_cache_dir", type=str, default="",
                        help="materialized-collated-batch cache "
                             "(data/batch_cache.py): the first pass persists "
                             "every batch; later passes stream mmap'd arrays "
                             "with no host compute")
    parser.add_argument("--pipeline_depth", type=int, default=4,
                        help="batches in flight before the oldest answer is "
                             "fetched (keeps dispatch ahead of the chip)")
    parser.add_argument("--warmup_batches", type=int, default=0,
                        help="restart the throughput clock after this many "
                             "batches have drained (excludes XLA compile and "
                             "cache-warming from the reported pairs/s; the "
                             "answers themselves are still written)")
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    model_cfg, train_dc, val_dc, trainer_cfg = configs_from_args(args)
    dc = val_dc if args.split == "val" else train_dc
    logger = setup_logging(trainer_cfg.output_dir, jax.process_index())

    ds = GQASuperNodeDataset(args.split, dc)
    id2ans = {v: k for k, v in ds.ans_w2id.items()}
    loader = BatchLoader(
        ds, trainer_cfg.batch_size, shuffle=False, drop_last=False,
        num_threads=trainer_cfg.num_workers, num_procs=trainer_cfg.num_procs,
        cache_dir=f"{trainer_cfg.cache_dir}/{args.split}" if trainer_cfg.cache_dir else None,
        batch_cache_dir=args.batch_cache_dir or None,
    )

    model = AttModelX3(model_cfg)
    probe = next(iter(loader))
    state = create_train_state(model, jax.random.key(0), probe, adam(trainer_cfg.lr))
    state = load_params_for_eval(args.weight_dir, state, args.weight_epoch)
    if args.int8:
        from structured_alignment_vqa_tpu.ops.quant import quantize_params

        model = AttModelX3(model_cfg.replace(int8_serving=True))
        state = state.replace(params=quantize_params(jax.device_get(state.params)))
    mesh = fitting_mesh(trainer_cfg.batch_size, trainer_cfg.model_parallel)
    state = shard_state(state, mesh)
    predict = make_predict_step(model)

    sink = sys.stdout if args.out == "-" else open(args.out, "w")
    t0 = time.perf_counter()
    n_out = 0
    n_drained = 0
    n_at_t0 = 0
    idx = 0

    def drain(preds_dev, valid, base):
        nonlocal n_out, n_drained, t0, n_at_t0
        preds = np.asarray(preds_dev)  # blocks on this batch only
        for j in range(len(preds)):
            if valid[j]:
                aid = int(preds[j])
                sink.write(json.dumps({
                    "index": base + j, "answer_id": aid,
                    "answer": id2ans.get(aid, "<other>"),
                }) + "\n")
                n_out += 1
        n_drained += 1
        if n_drained == args.warmup_batches:
            t0 = time.perf_counter()
            n_at_t0 = n_out

    # pipelined serving: dispatch is async, so while the chip runs batch t
    # the host collates batch t+1 and fetches batch t-pipeline_depth's
    # answers. Batches ship in the 3-array wire format (data/wire.py) — the
    # per-array transfer overhead that dominated the train loop applies
    # identically here — with f32 features as bf16 when the model computes
    # in bf16, and pack+put on a worker thread: device_put through the
    # remote-TPU tunnel blocks its calling thread, so an inline put would
    # serialize transfer with dispatch (same fix as train/loop._mesh_iter).
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from structured_alignment_vqa_tpu.data.wire import pack_wire

    bf16_wire = model_cfg.compute_dtype == jnp.bfloat16

    def ship(batch):
        return put_batch(pack_wire(batch, bf16_features=bf16_wire), mesh)

    pending: deque = deque()
    shipped: deque = deque()
    try:
        with ThreadPoolExecutor(1) as ex:
            for batch in loader:
                shipped.append((ex.submit(ship, batch),
                                np.asarray(batch.sample_valid)))
                if len(shipped) < 2:
                    continue
                dev, valid = shipped.popleft()
                pending.append((predict(state, dev.result()), valid, idx))
                idx += len(valid)
                if len(pending) >= max(args.pipeline_depth, 1):
                    drain(*pending.popleft())
            while shipped:
                dev, valid = shipped.popleft()
                pending.append((predict(state, dev.result()), valid, idx))
                idx += len(valid)
        while pending:
            drain(*pending.popleft())
    finally:
        if sink is not sys.stdout:
            sink.close()
    dt = time.perf_counter() - t0
    n_timed = n_out - n_at_t0
    logger.info(
        "predicted %d answers%s in %.2fs (%.0f pairs/s)",
        n_out,
        f" ({n_timed} timed after {args.warmup_batches}-batch warmup)"
        if n_at_t0 else "",
        dt, n_timed / max(dt, 1e-9),
    )
    return n_out


if __name__ == "__main__":
    main()

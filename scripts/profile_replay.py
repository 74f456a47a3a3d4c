"""Dissect the batch-replay train-step wall clock on the attached chip.

The accuracy runs showed ~0.7-0.8 steps/s in replay epochs where the chip
step alone should run ~10/s. This times each stage of the replay path
separately, then the pipelined loop as the trainer actually runs it:

  fetch     — BatchCache.batch(i): mmap read + header parse (host)
  pack      — pack_wire: dtype-group flatten/concat (host)
  put       — jax.device_put of the wire arrays (tunnel transfer)
  step      — the jitted train step, chained (device)
  pipelined — the trainer's loop shape: put 2 ahead, metrics drained 4 late

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_replay.py \
           --cache /tmp/gqa_prod_run/cache/train_batches [--n 30]
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np


def timeit(fn, n, sync=lambda r: None):
    # warm
    sync(fn(0))
    t0 = time.perf_counter()
    for i in range(n):
        sync(fn(i))
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cache", required=True)
    p.add_argument("--n", type=int, default=30)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--blocks", type=int, default=6)
    args = p.parse_args()

    from structured_alignment_vqa_tpu.data.batch_cache import BatchCache
    from structured_alignment_vqa_tpu.data.wire import pack_wire
    from structured_alignment_vqa_tpu.models import AttModelX3
    from structured_alignment_vqa_tpu.models.config import ModelConfig
    from structured_alignment_vqa_tpu.parallel import create_train_state, make_train_step
    from structured_alignment_vqa_tpu.parallel.mesh import fitting_mesh
    from structured_alignment_vqa_tpu.parallel.train_step import adam, put_batch, shard_state
    import jax.numpy as jnp

    cache = BatchCache(args.cache)
    n = min(args.n, len(cache))
    print(f"{len(cache)} cached batches; timing over {n}")

    b0 = cache.batch(0)
    sizes = {}
    w0 = pack_wire(b0)
    for g in ("f32", "i32", "i8"):
        sizes[g] = np.asarray(getattr(w0, g)).nbytes
    print(f"wire bytes/batch: f32 {sizes['f32']/1e6:.1f} MB, "
          f"i32 {sizes['i32']/1e6:.1f} MB, i8 {sizes['i8']/1e6:.1f} MB")

    dt = timeit(lambda i: cache.batch(i % len(cache)), n)
    print(f"fetch : {dt*1e3:7.1f} ms")
    dt = timeit(lambda i: pack_wire(cache.batch(i % len(cache))), n)
    print(f"+pack : {dt*1e3:7.1f} ms (incl fetch)")

    mesh = fitting_mesh(b0.batch_size, 1)
    wires = [pack_wire(cache.batch(i % len(cache))) for i in range(min(n, 8))]
    dt = timeit(
        lambda i: put_batch(wires[i % len(wires)], mesh), n,
        sync=lambda w: jax.block_until_ready(w.f32),
    )
    print(f"put   : {dt*1e3:7.1f} ms (block_until_ready fence; tunnel-unreliable, lower bound)")

    # the real train step on the real cached shapes
    cfg = ModelConfig(
        num_classes=1843, num_relations=310, only_obj=True,
        compute_dtype=jnp.bfloat16, share_glove=True, dropout_rate=0.2,
        hidden_size=args.hidden, num_blocks=args.blocks, topn=5,
    )
    cfg = cfg.replace(num_classes=int(1 + 16))  # tiny head; FLOPs dominated by blocks
    model = AttModelX3(cfg)
    tx = adam(1e-3)
    state = create_train_state(model, jax.random.key(0), b0, tx)
    state = shard_state(state, mesh)
    step = make_train_step(model, tx, cfg, with_milnce=True)
    rng = jax.random.key(1)

    dev = put_batch(wires[0], mesh)
    state, m = step(state, dev, rng)
    float(m["loss"])  # compile + settle

    # device-only: reuse one resident batch, chain state
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, dev, rng)
    float(m["loss"])
    print(f"step  : {(time.perf_counter()-t0)/n*1e3:7.1f} ms (resident batch, chained)")

    # pipelined, as the trainer runs it (fresh batch each step, put 2 ahead,
    # metrics 4 late)
    from collections import deque

    pending: deque = deque()
    devq: deque = deque(put_batch(wires[j], mesh) for j in range(2))
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, devq.popleft(), rng)
        devq.append(put_batch(wires[(i + 2) % len(wires)], mesh))
        pending.append(m)
        if len(pending) > 4:
            float(pending.popleft()["loss"])
    while pending:
        float(pending.popleft()["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"piped : {dt*1e3:7.1f} ms/step -> {b0.batch_size/dt:.0f} samples/s")


if __name__ == "__main__":
    main()

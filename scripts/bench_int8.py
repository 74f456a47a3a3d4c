"""int8 weight-only serving: throughput + memory delta on the attached chip.

Same workload as bench.py (production obj-only serving point); compares the
f32-weight model against `quantize_params` + `int8_serving=True`. Records
the VERDICT-r1 #9 deliverable numbers (docs/DESIGN.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import ModelConfig
from structured_alignment_vqa_tpu.ops.quant import quantize_params


def nbytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def run(model, variables, batch, n=30):
    @jax.jit
    def predict_chained(variables, batch, acc):
        b = batch.replace(vis_fea=batch.vis_fea + acc * 1e-6)
        lc, lv, ls_, _, _ = model.apply(variables, b, deterministic=True)
        log_sm = (
            jax.nn.log_softmax(lv.astype(jnp.float32), -1)
            + jax.nn.log_softmax(ls_.astype(jnp.float32), -1)
            + jax.nn.log_softmax(lc.astype(jnp.float32), -1)
        )
        return acc + jnp.sum(jnp.argmax(log_sm, -1)).astype(jnp.float32) * 1e-9

    # exact per-program memory from XLA, not an assertion (VERDICT r2 #6)
    try:
        ma = (predict_chained.lower(variables, batch, jnp.float32(0.0))
              .compile().memory_analysis())
        print(f"  serving program memory: args {ma.argument_size_in_bytes/1e6:.0f} MB, "
              f"temps {ma.temp_size_in_bytes/1e6:.0f} MB, "
              f"out {ma.output_size_in_bytes/1e6:.1f} MB")
    except Exception as e:  # memory_analysis availability varies by backend
        print(f"  (memory_analysis unavailable: {e})")

    acc = predict_chained(variables, batch, jnp.float32(0.0))
    float(acc)
    try:
        stats = jax.local_devices()[0].memory_stats()
        print(f"  device bytes_in_use after warmup: "
              f"{stats.get('bytes_in_use', 0)/1e6:.0f} MB "
              f"(limit {stats.get('bytes_limit', 0)/1e9:.1f} GB)")
    except Exception:
        pass
    t0 = time.perf_counter()
    for _ in range(n):
        acc = predict_chained(variables, batch, acc)
    float(acc)
    return (time.perf_counter() - t0) / n


def main():
    cfg = ModelConfig(
        num_classes=1843, num_relations=310, only_obj=True,
        compute_dtype=jnp.bfloat16, share_glove=True, dropout_rate=0.5,
    )
    bs = 128
    model = AttModelX3(cfg)
    batch = synthetic_batch(cfg, batch=bs, lv=36, lq=30, ls=98, seed=0)
    params = jax.jit(model.init)(jax.random.key(0), batch)["params"]

    dt = run(model, {"params": params}, batch)
    print(f"f32 weights : {dt*1e3:.1f} ms/iter -> {bs/dt:.0f} pairs/s, "
          f"params {nbytes(params)/1e6:.0f} MB")

    qparams = quantize_params(jax.device_get(params))
    del params
    qmodel = AttModelX3(cfg.replace(int8_serving=True))
    dt = run(qmodel, {"params": qparams}, batch)
    print(f"int8 weights: {dt*1e3:.1f} ms/iter -> {bs/dt:.0f} pairs/s, "
          f"params {nbytes(qparams)/1e6:.0f} MB")


if __name__ == "__main__":
    main()

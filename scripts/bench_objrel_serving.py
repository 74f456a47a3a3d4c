"""Obj+rel serving operating point (VERDICT r3 #6): maxlen-1600 flash path.

The reference's second production config (`submit.py:87`: obj+rel, maxlen
1600, per-device batch 4) had a measured TRAIN step (48.9 ms, flash fwd+bwd)
but no serving pairs/s anywhere — the long-sequence regime was untracked
round-over-round. This prints one JSON line (same shape as bench.py) and
writes ``BENCH_OBJREL_r05.json`` at the repo root so the regime has a pinned
number next to the obj-only 10k.

Operating point: B=4 (the reference's own obj+rel batch), symbolic encoder
length 1506+30=1536, bf16, flash kernel path (the L>512 regime where the
composite's (B, H, L, L) materialization loses — docs/DESIGN.md "Long
sequences"). A packed-style B=8 point is reported too: serving can batch
pairs even when training could not.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import ModelConfig

PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
              "TPU v5p": 459e12, "TPU v6 lite": 918e12}


def measure(batch_size: int, n_iters: int = 20):
    cfg = ModelConfig(
        num_classes=1843, num_relations=310, only_obj=False,
        hidden_size_mil=64, compute_dtype=jnp.bfloat16, share_glove=True,
        maxlen=1600, maxlen_q=40, maxlen_v=40,
        use_pallas_attention=True,  # flash kernels win for L > 512
        dropout_rate=0.5,
    )
    model = AttModelX3(cfg)
    batch = synthetic_batch(cfg, batch=batch_size, lv=36, lq=30, ls=1506,
                            n_rel=128, seed=0)
    params = jax.jit(model.init)(jax.random.key(0), batch)

    @jax.jit
    def predict_chained(variables, batch, acc):
        b = batch.replace(vis_fea=batch.vis_fea + acc * 1e-6)
        lc, lv, ls_, _, _ = model.apply(variables, b, deterministic=True)
        log_sm = (jax.nn.log_softmax(lv.astype(jnp.float32), -1)
                  + jax.nn.log_softmax(ls_.astype(jnp.float32), -1)
                  + jax.nn.log_softmax(lc.astype(jnp.float32), -1))
        return acc + jnp.sum(jnp.argmax(log_sm, -1)).astype(jnp.float32) * 1e-9

    acc = predict_chained(params, batch, jnp.float32(0.0))
    float(acc)
    try:
        cost = predict_chained.lower(params, batch, jnp.float32(0.0)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:  # noqa: BLE001
        flops = 0.0

    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        acc = predict_chained(params, batch, acc)
    float(acc)
    dt = time.perf_counter() - t0
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind, 197e12)
    return {
        "pairs_per_sec": round(batch_size * n_iters / dt, 2),
        "ms_per_batch": round(dt / n_iters * 1e3, 2),
        "mfu": round(flops * (n_iters / dt) / peak, 4),
        "tflops_per_pair": round(flops / batch_size / 1e12, 4),
    }


def main():
    out = {
        "metric": "objrel_serving_pairs_per_sec",
        "unit": "pairs/s/chip",
        "operating_point": "maxlen=1600 bucket=(36,1506,30) dtype=bf16 flash",
        "b4": measure(4),
        "b8": measure(8),
    }
    out["value"] = out["b4"]["pairs_per_sec"]
    with open("BENCH_OBJREL_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

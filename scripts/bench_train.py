"""Train-step microbenchmarks on the attached TPU chip.

Usage: python scripts/bench_train.py [objrel|packed|aligned] ...

Timing uses chained data dependencies (state feeds the next step) plus one
final host read — `block_until_ready` is not a reliable fence through the
remote-TPU tunnel (see bench.py).

Workloads:
  objrel   — the obj+rel production point (`submit.py:87`: maxlen 1600,
             hidden_size_mil 64): B=4, symbolic encoder length 1536, bf16,
             flash-kernel path. Round-1 baselines at these shapes: 124 ms/step
             (composite), 69.5 ms/step (flash fwd + scan-chunked remat bwd).
  packed   — per-row step time at the obj-only serving point (L=128) for an
             unpacked batch vs a packed one (n_pack=3): packing's win is
             rows-per-epoch; this measures the per-row overhead it costs.
  aligned  — forward at the lane-aligned serving point, composite vs the
             flash kernel at L=128 (grid (B,1,H,1)) — the VERDICT r1 #5
             question: can a kernel beat XLA's fusion on aligned shapes?
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import ModelConfig
from structured_alignment_vqa_tpu.parallel.train_step import (
    TrainState, adam, make_train_step,
)


# bf16 peak of the attached chip (bench.py has the full table)
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
              "TPU v5p": 459e12, "TPU v6 lite": 918e12}


def step_flops(step, state, batch, rng):
    """FLOPs of one jitted train step from XLA's own cost model."""
    try:
        cost = step.lower(state, batch, rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def time_steps(step, state, batch, rng, n=20, warmup=2):
    flops = step_flops(step, state, batch, rng)
    for _ in range(warmup):
        state, metrics = step(state, batch, rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch, rng)
    float(metrics["loss"])  # forces the chain
    dt = (time.perf_counter() - t0) / n
    if flops:
        peak = PEAK_FLOPS.get(jax.devices()[0].device_kind, 197e12)
        print(f"  train-step MFU: {flops / dt / peak * 100:.1f}% "
              f"({flops / 1e9:.1f} GFLOP/step, XLA cost model)")
    return dt, state


def make_state(model, batch, tx, sparse_table=False, moments_dtype=jnp.float32):
    variables = jax.jit(model.init)(jax.random.key(0), batch)
    params = variables["params"]
    if sparse_table:
        from structured_alignment_vqa_tpu.parallel.sparse_table import (
            TABLE_PATH, init_table_opt,
        )
        from structured_alignment_vqa_tpu.parallel.train_step import (
            _empty_like, _tree_get, _tree_set,
        )
        table = _tree_get(params, TABLE_PATH)
        stub = _tree_set(params, TABLE_PATH, _empty_like(table))
        opt_state = (tx.init(stub), init_table_opt(table, moments_dtype))
    else:
        opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        constants=dict(variables.get("constants", {})),
    )


def bench_sparse():
    """Dense vs sparse table optimizer at the bs-128 obj-only production
    point (VERDICT r3 #1): the dense step's 11.3 ms scatter-grad + 17.7 ms
    dense Adam over the 407k x 300 table is the measured MFU bound."""
    cfg = ModelConfig(
        num_classes=1843, num_relations=310, only_obj=True,
        compute_dtype=jnp.bfloat16, share_glove=True,
        maxlen=450, maxlen_q=40, maxlen_v=36, vis_fea_dim=2048,
    )
    model = AttModelX3(cfg)
    batch = synthetic_batch(cfg, batch=128, lv=36, lq=30, ls=98, seed=0)
    tx = adam(1e-4)

    state = make_state(model, batch, tx)
    step = make_train_step(model, tx, cfg, with_milnce=True)
    dt, _ = time_steps(step, state, batch, jax.random.key(1))
    print(f"dense  table opt: {dt*1e3:.1f} ms/step -> {128/dt:.0f} samples/s")

    for mdt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        state = make_state(model, batch, tx, sparse_table=True, moments_dtype=mdt)
        step = make_train_step(
            model, tx, cfg, with_milnce=True, sparse_table=True, table_lr=1e-4
        )
        dt, _ = time_steps(step, state, batch, jax.random.key(1))
        print(f"sparse table opt ({name} moments): {dt*1e3:.1f} ms/step "
              f"-> {128/dt:.0f} samples/s")


def bench_objrel(use_pallas=True, remat=False):
    cfg = ModelConfig(
        num_classes=1843, num_relations=310, only_obj=False,
        hidden_size_mil=64, compute_dtype=jnp.bfloat16, share_glove=True,
        maxlen=1600, maxlen_q=40, maxlen_v=40,
        use_pallas_attention=use_pallas, remat_blocks=remat,
    )
    model = AttModelX3(cfg)
    batch = synthetic_batch(cfg, batch=4, lv=36, lq=30, ls=1506, n_rel=128, seed=0)
    tx = adam(1e-4)
    state = make_state(model, batch, tx)
    step = make_train_step(model, tx, cfg, with_milnce=True)
    dt, _ = time_steps(step, state, batch, jax.random.key(1))
    print(f"objrel train step (pallas={use_pallas}, remat={remat}): {dt*1e3:.1f} ms")


def bench_packed():
    from structured_alignment_vqa_tpu.data.dataset import BatchShape
    from structured_alignment_vqa_tpu.data.packing import collate_packed
    from tests.test_packing import mk_sample  # structurally-valid samples

    cfg = ModelConfig(
        num_classes=1843, num_relations=310, only_obj=True,
        compute_dtype=jnp.bfloat16, share_glove=True,
        maxlen=450, maxlen_q=40, maxlen_v=36, vis_fea_dim=2048,
    )
    model = AttModelX3(cfg)
    tx = adam(1e-4)

    unpacked = synthetic_batch(cfg, batch=128, lv=36, lq=30, ls=98, seed=0)
    state = make_state(model, unpacked, tx)
    step = make_train_step(model, tx, cfg, with_milnce=True)
    dt_u, _ = time_steps(step, state, unpacked, jax.random.key(1))
    print(f"unpacked train step (bs=128, L=128): {dt_u*1e3:.1f} ms "
          f"-> {128/dt_u:.0f} samples/s")

    rng = np.random.default_rng(0)
    shape = BatchShape(lv=36, ls=98, lq=30)
    groups = []
    for _ in range(128):
        g = [mk_sample(rng, 12, 32, 10, 1), mk_sample(rng, 12, 32, 10, 2),
             mk_sample(rng, 12, 32, 9, 3)]
        groups.append(g)
    # mk_sample emits 16-d visual features; collate at 16 then swap in 2048-d
    packed = jax.tree.map(
        jnp.asarray, collate_packed(groups, shape, 2, n_pack=3, fea_dim=16)
    )
    packed = packed.replace(vis_fea=jnp.asarray(
        rng.standard_normal((128, 36, 2048)).astype(np.float32)))
    state = make_state(model, packed, tx)
    step = make_train_step(model, tx, cfg, with_milnce=True)
    dt_p, _ = time_steps(step, state, packed, jax.random.key(1))
    print(f"packed   train step (bs=128, L=128, K=3): {dt_p*1e3:.1f} ms "
          f"-> {3*128/dt_p:.0f} samples/s (at 3x fill)")
    print(f"per-row packing overhead: {100*(dt_p-dt_u)/dt_u:.1f}%")


def bench_rowcost():
    """Train-step cost per row at each bucket shape (the packing trade: a
    bigger row costs more but carries more packed samples; fill factors from
    the 10k-sample generated dataset are in docs/DESIGN.md)."""
    shapes = ((50, 108, 20, 128), (100, 216, 40, 64), (100, 344, 40, 32),
              (100, 216, 40, 128), (100, 344, 40, 64))
    use_pallas = "--pallas" in sys.argv
    only = [int(k) for k in sys.argv[2:] if k.isdigit()] or range(len(shapes))
    for si in only:
        lv, ls, lq, bs = shapes[si]
        cfg = ModelConfig(
            num_classes=1843, num_relations=310, only_obj=True,
            compute_dtype=jnp.bfloat16, share_glove=True,
            maxlen=450, maxlen_q=lq, maxlen_v=lv, vis_fea_dim=2048,
            use_pallas_attention=use_pallas,
        )
        model = AttModelX3(cfg)
        tx = adam(1e-4)
        batch = synthetic_batch(cfg, batch=bs, lv=lv, lq=lq, ls=ls, seed=0)
        state = make_state(model, batch, tx)
        step = make_train_step(model, tx, cfg, with_milnce=True)
        dt, _ = time_steps(step, state, batch, jax.random.key(1))
        print(f"row (lv={lv}, ls={ls}, lq={lq}) bs={bs}: {dt*1e3:.1f} ms "
              f"-> {dt*1e6/bs:.0f} us/row")


def bench_aligned():
    from structured_alignment_vqa_tpu.ops.attention import attention_core, content_mask
    from structured_alignment_vqa_tpu.ops.pallas_attention import fused_graph_attention
    from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
        flash_graph_attention,
    )

    b, l, c, h = 128, 128, 512, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, l, c)).astype(np.float32)
    x[:, 120:] = 0.0
    q = jnp.asarray(np.maximum(x, 0), jnp.bfloat16)
    km = content_mask(jnp.asarray(x))
    graph = jnp.asarray((rng.random((b, l, l)) > 0.5).astype(np.float32))

    @jax.jit
    def run_composite(q, acc):
        out, _ = attention_core(q + acc * 1e-6, q, q, key_mask=km, query_mask=km,
                                num_heads=h, graph=graph, renorm="l1")
        return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

    @jax.jit
    def run_flash(q, acc):
        out = flash_graph_attention(q + acc * 1e-6, q, q, km, km, graph, h, "l1",
                                    q_tile=128, k_tile=128)
        return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

    @jax.jit
    def run_fused(q, acc):
        out = fused_graph_attention(q + acc * 1e-6, q, q, km, km, graph, h, "l1")
        return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

    for name, fn in (("composite", run_composite), ("flash L=128", run_flash),
                     ("fused full-L", run_fused)):
        acc = fn(q, jnp.float32(0.0)); float(acc)
        t0 = time.perf_counter()
        for _ in range(50):
            acc = fn(q, acc)
        float(acc)
        print(f"{name}: {(time.perf_counter()-t0)/50*1e3:.2f} ms/iter")


def bench_composed():
    """The composed production operating point (VERDICT r4 #7): sequence
    packing (n_pack=4) x sparse/segmented table optimizer x bf16 moments, at
    the lane-aligned obj-only bucket. Reports BOTH MFU framings:

    * hardware MFU — the packed step's own cost-model FLOPs / wall, the
      number comparable to the round-3 per-step table;
    * per-sample goodput — samples/s x the UNPACKED per-sample FLOPs / peak:
      packing does not add useful FLOPs, so goodput counts each sample once
      and rewards packing only through wall-clock.
    """
    from structured_alignment_vqa_tpu.data.dataset import BatchShape
    from structured_alignment_vqa_tpu.data.packing import collate_packed
    from tests.test_packing import mk_sample

    cfg = ModelConfig(
        num_classes=1843, num_relations=310, only_obj=True,
        compute_dtype=jnp.bfloat16, share_glove=True,
        maxlen=450, maxlen_q=40, maxlen_v=36, vis_fea_dim=2048,
    )
    model = AttModelX3(cfg)
    tx = adam(1e-4)
    peak = None

    unpacked = synthetic_batch(cfg, batch=128, lv=36, lq=30, ls=98, seed=0)
    state = make_state(model, unpacked, tx)
    step = make_train_step(model, tx, cfg, with_milnce=True)
    per_sample_flops = step_flops(step, state, unpacked, jax.random.key(1)) / 128
    dt_u, _ = time_steps(step, state, unpacked, jax.random.key(1))
    print(f"unpacked+dense : {dt_u*1e3:.1f} ms/step -> {128/dt_u:.0f} samples/s")

    rng = np.random.default_rng(0)
    shape = BatchShape(lv=36, ls=98, lq=30)
    k = 4
    groups = [[mk_sample(rng, 9, 24, 7, j) for j in range(1, k + 1)]
              for _ in range(128)]
    packed = jax.tree.map(
        jnp.asarray, collate_packed(groups, shape, 2, n_pack=k, fea_dim=16))
    packed = packed.replace(vis_fea=jnp.asarray(
        rng.standard_normal((128, 36, 2048)).astype(np.float32)))

    state = make_state(model, packed, tx, sparse_table=True,
                       moments_dtype=jnp.bfloat16)
    step = make_train_step(model, tx, cfg, with_milnce=True,
                           sparse_table=True, table_lr=1e-4)
    flops_p = step_flops(step, state, packed, jax.random.key(1))
    dt_p, _ = time_steps(step, state, packed, jax.random.key(1))
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind, 197e12)
    sps = k * 128 / dt_p
    print(f"packed(K={k})+sparse(bf16): {dt_p*1e3:.1f} ms/step "
          f"-> {sps:.0f} samples/s (full fill)")
    print(f"  hardware MFU: {flops_p / dt_p / peak * 100:.1f}%   "
          f"per-sample goodput: {per_sample_flops * sps / peak * 100:.1f}% "
          f"({per_sample_flops/1e9:.2f} GFLOP/sample useful)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "objrel"
    if which == "objrel":
        use_pallas = "--composite" not in sys.argv
        bench_objrel(use_pallas=use_pallas, remat="--remat" in sys.argv)
    elif which == "packed":
        bench_packed()
    elif which == "rowcost":
        bench_rowcost()
    elif which == "aligned":
        bench_aligned()
    elif which == "sparse":
        bench_sparse()
    elif which == "composed":
        bench_composed()

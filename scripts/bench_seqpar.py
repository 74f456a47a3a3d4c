"""Ring vs Ulysses sequence parallelism: comm volume + virtual-mesh timing.

One real chip is attached, so multi-chip wall-clock is unmeasurable here
(CLAUDE.md). What CAN be measured exactly:

* **bytes moved per device per layer**, counted from the compiled HLO's
  collective ops (ppermute / all-to-all operand sizes) — the quantity the
  ICI roofline turns into time, and hardware-independent;
* **peak per-device graph/activation memory** implied by the sharding
  (the ring keeps the adjacency row-sharded; Ulysses replicates it);
* CPU virtual-mesh wall-clock as a sanity signal only (interpret-mode
  kernels dominate; do not read it as TPU time).

Usage: python scripts/bench_seqpar.py [L] [n_dev] [heads] [--bytes_only]
(--bytes_only compiles and counts HLO collective bytes without executing —
large-L interpret-mode runs take many minutes on this 1-core box and add
no information beyond the compile.)
"""

from __future__ import annotations

import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import time

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from structured_alignment_vqa_tpu.ops.attention import content_mask
from structured_alignment_vqa_tpu.ops.ring_attention import ring_graph_attention
from structured_alignment_vqa_tpu.ops.ulysses_attention import ulysses_graph_attention

_SHAPE = re.compile(r"(bf16|f32|f16|s32|s8|u8|pred)\[([\d,]*)\]")


def collective_bytes(hlo: str) -> dict:
    """Sum operand bytes of each collective kind in an HLO dump."""
    sizes = {"collective-permute": 0, "all-to-all": 0, "all-gather": 0,
             "all-reduce": 0, "reduce-scatter": 0}
    width = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "s8": 1, "u8": 1, "pred": 1}
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r".*= (\S+?)\[", line)  # "x = f32[...] collective-permute(...)"
        for kind in sizes:
            if f" {kind}(" in line or f"{kind}-start(" in line:
                sm = _SHAPE.search(line)
                if sm:
                    dims = [int(d) for d in sm.group(2).split(",") if d]
                    n = 1
                    for d in dims:
                        n *= d
                    sizes[kind] += n * width[sm.group(1)]
    return {k: v for k, v in sizes.items() if v}


def main():
    bytes_only = "--bytes_only" in sys.argv
    argv = [a for a in sys.argv if a != "--bytes_only"]
    l = int(argv[1]) if len(argv) > 1 else 1536
    n = int(argv[2]) if len(argv) > 2 else 4
    h = int(argv[3]) if len(argv) > 3 else 8
    b, c = 4, 512
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, l, c)).astype(np.float32)
    x[:, -40:] = 0.0
    q = jnp.asarray(np.maximum(x * 0.5 + 0.1, 0))
    k = jnp.asarray(np.maximum(x * 0.3 - 0.05, 0))
    v = jnp.asarray(np.maximum(x, 0))
    km = content_mask(jnp.asarray(x))
    qm = content_mask(jnp.asarray(x))
    graph = jnp.asarray((rng.random((b, l, l)) > 0.4).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(1, n), ("data", "seq"))

    def grad_ring(q, k, v):
        return jax.grad(lambda q_: jnp.sum(ring_graph_attention(
            q_, k, v, km, qm, graph, h, "l1", mesh=mesh, q_tile=64,
            k_tile=min(l // n, 512), interpret=True) ** 2))(q)

    def grad_uly(q, k, v):
        return jax.grad(lambda q_: jnp.sum(ulysses_graph_attention(
            q_, k, v, km, qm, graph, h, "l1", mesh=mesh, q_tile=64,
            k_tile=512, interpret=True) ** 2))(q)

    print(f"B={b} L={l} C={c} heads={h} n_seq={n} (f32 here; bf16 on chip halves bytes)")
    for name, fn in (("ring", grad_ring), ("ulysses", grad_uly)):
        if name == "ulysses" and h % n:
            print(f"{name}: n/a (heads % n != 0)")
            continue
        jitted = jax.jit(fn)
        hlo = jitted.lower(q, k, v).compile().as_text()
        byts = collective_bytes(hlo)
        total = sum(byts.values())
        graph_mb = (b * l * (l // n if name == "ring" else l) * 4) / 1e6
        if bytes_only:
            print(f"{name:8s} fwd+bwd collectives: {byts}  total {total/1e6:.1f} MB "
                  f"| per-device graph mem: {graph_mb:.0f} MB | (not executed)")
            continue
        t0 = time.perf_counter()
        r = jitted(q, k, v)
        jax.block_until_ready(r)
        t1 = time.perf_counter()
        r = jitted(q, k, v)
        jax.block_until_ready(r)
        t2 = time.perf_counter()
        print(f"{name:8s} fwd+bwd collectives: {byts}  total {total/1e6:.1f} MB "
              f"| per-device graph mem: {graph_mb:.0f} MB "
              f"| cpu-mesh wall (2nd call): {t2 - t1:.2f}s (interpret-dominated)")


if __name__ == "__main__":
    main()

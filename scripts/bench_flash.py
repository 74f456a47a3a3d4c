"""Flash-kernel chip regression: fwd and fwd+bwd at the obj+rel operating
point (B=4, L=1536, C=512, 8 heads, bf16), matching the round-2 numbers in
docs/DESIGN.md (1.80 ms fwd / 5.2 ms grad at tiles (128, 1536)).

Also times the inference path before/after the emit="out" change (the
per-row stats are no longer materialized when nothing consumes them).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from structured_alignment_vqa_tpu.ops.attention import content_mask
from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
    _flash_forward,
    flash_graph_attention,
)


def timed(fn, q, *rest, iters=20, warmup=3):
    """Chained-dependency timing: feed each iteration's (B, L, C) output back
    as the next query — block_until_ready is not a reliable fence through the
    axon tunnel (CLAUDE.md)."""
    cur = q
    for _ in range(warmup):
        cur = fn(cur, *rest)
    float(jnp.sum(cur.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = fn(cur, *rest)
    float(jnp.sum(cur.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices())
    b, l, c, h = 4, 1536, 512, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, l, c)).astype(np.float32)
    x[:, -40:] = 0.0
    q = jnp.asarray(np.maximum(x * 0.5 + 0.1, 0), jnp.bfloat16)
    k = jnp.asarray(np.maximum(x * 0.3 - 0.05, 0), jnp.bfloat16)
    v = jnp.asarray(np.maximum(x, 0), jnp.bfloat16)
    km = content_mask(jnp.asarray(x))
    qm = content_mask(jnp.asarray(x))
    graph = jnp.asarray((rng.random((b, l, l)) > 0.4).astype(np.float32))

    fwd_out = jax.jit(lambda q_: flash_graph_attention(
        q_, k, v, km, qm, graph, h, "l1"))
    fwd_stats = jax.jit(lambda q_: _flash_forward(
        q_, k, v, km, qm, graph, h, "l1", emit="stats")[0])
    grad = jax.jit(lambda q_: jax.grad(
        lambda qq: jnp.sum(
            flash_graph_attention(qq, k, v, km, qm, graph, h, "l1")
            .astype(jnp.float32) ** 2
        ))(q_).astype(q_.dtype))

    t_out = timed(fwd_out, q)
    t_stats = timed(fwd_stats, q)
    t_grad = timed(grad, q, iters=10)
    print(f"fwd emit=out   : {t_out:7.2f} ms   (inference path, stats elided)")
    print(f"fwd emit=stats : {t_stats:7.2f} ms   (custom_vjp fwd; r2 = 1.80)")
    print(f"fwd+bwd        : {t_grad:7.2f} ms   (r2 = 5.2)")

    # correctness spot check on chip vs composite
    from structured_alignment_vqa_tpu.ops.attention import attention_core

    got = fwd_out(q)
    want, _ = attention_core(
        q, k, v, key_mask=km, query_mask=qm, num_heads=h,
        graph=graph, renorm="l1",
    )
    diff = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    print(f"max |flash - composite| (bf16): {diff:.2e}")
    assert diff < 2e-2, diff


if __name__ == "__main__":
    main()

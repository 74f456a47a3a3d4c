"""Ring (sequence-sharded) graph-guided attention over the ICI mesh.

SURVEY.md §5.7's extension point, built: the flash kernel's K-streaming loop
(`pallas_flash_attention.py`) generalizes to a ring over sequence shards.
Each device holds a contiguous slice of the (modality ++ question) token
sequence — its Q rows, its K/V rows, and its *row stripe* of the adjacency
(`graph[:, my_rows, :]`, full column extent). K/V blocks (plus their content
key-mask) rotate around the ring with ``jax.lax.ppermute``; the adjacency
never moves, because the columns a device needs at ring step ``t`` are a
static-size dynamic slice of its local row stripe.

The merge across ring steps is the same online-softmax algebra the kernel
uses across K tiles: per-step partials

    a_t = sum_j exp(s_j - m_t) g_j v_j,   b_t = sum exp(s_j - m_t) g_j,
    z_t = sum exp(s_j - m_t)

combine with m = max_t m_t, c_t = exp(m_t - m), then the graph renorm divides
once at the end (`out = sum c_t a_t / max(sum c_t b_t, eps * sum c_t z_t)` for
the L1 variant, matching `modules.py:278-285`). The per-(row) stats (m, z, b)
that come out of the merge are *global*, so the hand-derived flash backward
kernels run unchanged per block — the backward rotates K/V together with
their gradient accumulators, which arrive home after a full cycle.

Numerics: partials accumulate in f32 exactly like the single-device kernel;
the only difference is summation *order* across shards, so parity with the
single-device path is a few f32 ulps, not bit-exact (the tests pin ~1e-6
relative). Reference anchor: `modules.py:210-311` at the maxlen-1600 regime
(`submit.py:87`), which the reference could never shard.

Communication cost per layer: 2 (K, V) + 1 mask array per step forward,
plus 2 f32 gradient accumulators backward — all (B, L/n, C) sized, riding
ICI neighbor links only (ppermute), never DCN-visible collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.ops.attention import L1_NORM_EPS, SUM_NORM_EPS
from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
    _flash_backward,
    _flash_forward,
)

# None = auto: interpret Pallas on CPU (virtual-device tests), compile on TPU.
INTERPRET_MODE: Optional[bool] = None


def _interpret(flag: Optional[bool]) -> bool:
    if flag is not None:
        return flag
    if INTERPRET_MODE is not None:
        return INTERPRET_MODE
    return jax.default_backend() == "cpu"


def _merge(m, z, bs, a, m_t, z_t, b_t, a_t):
    """Online-softmax merge of two partial-accumulator sets."""
    m_new = jnp.maximum(m, m_t)
    c_old = jnp.exp(m - m_new)
    c_new = jnp.exp(m_t - m_new)
    return (
        m_new,
        z * c_old + z_t * c_new,
        bs * c_old + b_t * c_new,
        a * c_old + a_t * c_new,
    )


def _ring_forward(q, k, v, key_mask, query_mask, graph_rows,
                  num_heads: int, renorm: str, axis_name: str, n_shards: int,
                  q_tile: int, k_tile: Optional[int], interpret: bool):
    """Per-shard forward. All args are *local* shards (inside shard_map).

    Returns (out (B, Lloc, C), m, z, b stats padded (B, H, Lq_pad, 1)).
    """
    b, lq_loc, c = q.shape
    lk_loc = k.shape[1]
    dh = c // num_heads
    lq_pad = ((lq_loc + q_tile - 1) // q_tile) * q_tile
    idx = jax.lax.axis_index(axis_name)
    # send-to-left rotation: after t steps this device holds the block that
    # started on device (idx + t) % n — blocks sweep in ascending order.
    perm = [(j, (j - 1) % n_shards) for j in range(n_shards)]

    m = jnp.full((b, num_heads, lq_pad, 1), -jnp.inf, jnp.float32)
    z = jnp.zeros((b, num_heads, lq_pad, 1), jnp.float32)
    bs = jnp.zeros((b, num_heads, lq_pad, 1), jnp.float32)
    a = jnp.zeros((b, num_heads, lq_pad, dh), jnp.float32)

    k_blk, v_blk, km_blk = k, v, key_mask
    for t in range(n_shards):
        src = jax.lax.rem(idx + t, n_shards)
        g_blk = jax.lax.dynamic_slice_in_dim(
            graph_rows, src * lk_loc, lk_loc, axis=2
        )
        a_t, m_t, z_t, b_t = _flash_forward(
            q, k_blk, v_blk, km_blk, query_mask, g_blk, num_heads, renorm,
            q_tile=q_tile, k_tile=k_tile, interpret=interpret, emit="partial",
        )
        m, z, bs, a = _merge(m, z, bs, a, m_t, z_t, b_t, a_t)
        if t < n_shards - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            km_blk = jax.lax.ppermute(km_blk, axis_name, perm)

    if renorm == "l1":
        out = a / jnp.maximum(bs, L1_NORM_EPS * z)
    else:
        out = a / (bs + SUM_NORM_EPS * z)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq_pad, c)[:, :lq_loc, :]
    out = out * query_mask.astype(jnp.float32)[:, :, None]
    return out.astype(q.dtype), m, z, bs


def _ring_backward_loop(q, k, v, key_mask, query_mask, graph_rows, out,
                        m, z, bs, dy,
                        num_heads: int, renorm: str, axis_name: str,
                        n_shards: int, q_tile: int, k_tile: Optional[int],
                        interpret: bool):
    b, lq_loc, c = q.shape
    lk_loc = k.shape[1]
    idx = jax.lax.axis_index(axis_name)
    perm = [(j, (j - 1) % n_shards) for j in range(n_shards)]

    dq = jnp.zeros((b, lq_loc, c), jnp.float32)
    dk_blk = jnp.zeros((b, lk_loc, c), jnp.float32)
    dv_blk = jnp.zeros((b, lk_loc, c), jnp.float32)
    k_blk, v_blk, km_blk = k, v, key_mask
    for t in range(n_shards):
        src = jax.lax.rem(idx + t, n_shards)
        g_blk = jax.lax.dynamic_slice_in_dim(
            graph_rows, src * lk_loc, lk_loc, axis=2
        )
        dq_t, dk_t, dv_t = _flash_backward(
            q, k_blk, v_blk, km_blk, query_mask, g_blk, out, m, z, bs, dy,
            num_heads, renorm, q_tile, k_tile, interpret,
        )
        dq = dq + dq_t.astype(jnp.float32)
        dk_blk = dk_blk + dk_t.astype(jnp.float32)
        dv_blk = dv_blk + dv_t.astype(jnp.float32)
        # unlike the forward, the *last* rotation matters: it carries each
        # block's gradient accumulators back to their home device.
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        km_blk = jax.lax.ppermute(km_blk, axis_name, perm)
        dk_blk = jax.lax.ppermute(dk_blk, axis_name, perm)
        dv_blk = jax.lax.ppermute(dv_blk, axis_name, perm)
    return dq.astype(q.dtype), dk_blk.astype(k.dtype), dv_blk.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def ring_graph_attention_shard(q, k, v, key_mask, query_mask, graph_rows,
                               num_heads: int, renorm: str, axis_name: str,
                               n_shards: int, q_tile: int = 128,
                               k_tile: Optional[int] = None,
                               interpret: Optional[bool] = None):
    """Sequence-sharded graph attention; call *inside* shard_map.

    q/k/v: (B, L/n, C) local rows. key_mask/query_mask: (B, L/n) content
    masks of the local rows. graph_rows: (B, L/n, L) local row stripe of the
    adjacency. L must be divisible by the ``axis_name`` mesh axis size.
    """
    out, _, _, _ = _ring_forward(
        q, k, v, key_mask, query_mask, graph_rows, num_heads, renorm,
        axis_name, n_shards, q_tile, k_tile, _interpret(interpret),
    )
    return out


def _ring_fwd(q, k, v, key_mask, query_mask, graph_rows, num_heads, renorm,
              axis_name, n_shards, q_tile, k_tile, interpret):
    out, m, z, bs = _ring_forward(
        q, k, v, key_mask, query_mask, graph_rows, num_heads, renorm,
        axis_name, n_shards, q_tile, k_tile, _interpret(interpret),
    )
    return out, (q, k, v, key_mask, query_mask, graph_rows, out, m, z, bs)


def _ring_bwd(num_heads, renorm, axis_name, n_shards, q_tile, k_tile,
              interpret, res, dy):
    q, k, v, key_mask, query_mask, graph_rows, out, m, z, bs = res
    dq, dk, dv = _ring_backward_loop(
        q, k, v, key_mask, query_mask, graph_rows, out, m, z, bs, dy,
        num_heads, renorm, axis_name, n_shards, q_tile, k_tile,
        _interpret(interpret),
    )
    return dq, dk, dv, None, None, None


ring_graph_attention_shard.defvjp(_ring_fwd, _ring_bwd)


def ring_graph_attention(q, k, v, key_mask, query_mask, graph,
                         num_heads: int, renorm: str, mesh,
                         seq_axis: str = "seq", batch_axis: str = "data",
                         q_tile: int = 128, k_tile: Optional[int] = None,
                         interpret: Optional[bool] = None):
    """shard_map wrapper: global (B, L, C) arrays in, ring attention inside.

    The sequence dim shards over ``seq_axis``, the batch over ``batch_axis``;
    the adjacency shards by *rows* only (its column dim stays whole per
    device, O(L^2/n) bytes). GSPMD reshards inputs as needed, so this drops
    into a jitted train step whose activations are already data-sharded.
    """
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[seq_axis]
    l = q.shape[1]
    if l % n:
        raise ValueError(
            f"ring attention needs seq length {l} divisible by the "
            f"'{seq_axis}' mesh axis ({n}); pick a bucket maxlen that is"
        )
    def fn(q, k, v, km, qm, g):
        # positional: custom_vjp nondiff_argnums don't bind by keyword
        return ring_graph_attention_shard(
            q, k, v, km, qm, g, num_heads, renorm, seq_axis, n,
            q_tile, k_tile, interpret,
        )
    row = P(batch_axis, seq_axis, None)
    vec = P(batch_axis, seq_axis)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(row, row, row, vec, vec, row),
        out_specs=row,
        check_vma=False,   # pallas out_shapes carry no vma on jax 0.9
    )(q, k, v, key_mask, query_mask, graph)

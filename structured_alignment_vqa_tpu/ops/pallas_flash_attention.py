"""Flash-style (K-blocked) graph-guided attention for long sequences.

The full-length kernel (`pallas_attention.py`) holds the (L, L) attention
matrix in VMEM — fine at the obj-only operating point (L <= 512), impossible
at the obj+rel one (L ~ 1640: the score tile alone is ~11 MB and the graph
another 11 MB). This kernel streams K/V *and the adjacency tiles* with the
standard online-softmax recurrence (SURVEY.md section 5.7's sketched extension
point).

The graph renorm folds into the recurrence because the softmax normalizer
cancels: with running max m and

    a = sum_j exp(s_j - m) * g_j * v_j        (C-vector per query row)
    b = sum_j exp(s_j - m) * g_j              (scalar per query row)
    z = sum_j exp(s_j - m)                    (softmax normalizer)

the unblocked result  N = (P*g) / max(sum(P*g), eps)  @ V  becomes

    l1:      out = a / max(b, eps * z)        (P = exp(s-m)/z cancels)
    sum_eps: out = a / (b + eps * z)

so a single pass over K tiles suffices — no second pass, no (L, L) tensor.
Key-masked columns enter as exp(-2^32+1 - m) == 0 exactly, like the
reference's fill (`modules.py:261`).

Accumulators live in VMEM scratch and persist across the innermost grid
dimension (TPU grids iterate sequentially); the output tile is written on the
last K step.

Backward is a pair of hand-derived flash-style Pallas kernels (dQ and dK/dV)
that recompute score tiles from the forward's saved per-row stats (m, z, b).
The key identity: for the L1 renorm, the gradient of the renorm denominator
cancels the softmax's rho term exactly, so with n = e*g / max(b, eps*z) (the
final post-renorm weights), p = e/z, delta_i = dO_i . out_i, and
ind = [b > eps*z],

    dS = n * (dN - ind*delta) - p * (1-ind) * delta          (l1)
    dS = n * (dN - delta) - e * delta * eps_s / (b + eps_s*z) (sum_eps)

— i.e. the standard flash backward with the *renormalized* weights in place
of softmax probs (plus a dead-row correction that is zero on any row with a
live graph neighbor). Derivation: rho = sum_k p_k dp_k evaluates to
delta*(1 - ind), because sum_k w_k dN_k = D*delta for either denominator D.

Measured on v5e at the obj+rel operating point (B=4, L=1536, C=512, 8 heads),
parity-exact vs the composite (bf16 max diff ~4e-3). Round-2 re-sweep with
the hand-derived backward in place (fwd / full grad = fwd+bwd, ms/iter):

    tiles (128, 1536):  1.80 fwd   5.2 grad   <- default
    tiles (256, 1536):  1.94 fwd   165 grad   — bwd kernel VMEM-pathological
    tiles (256,  768):  1.87 fwd   5.9 grad
    tiles (512, 1536):  2.24 fwd   4.5 grad   — coarse q padding at odd L

Defaults: q_tile=128 (finest padding granularity at production maxlen 1600,
within 15% of the best grad time) and the largest k_tile that keeps the
(TQ, TK) score+graph tiles within budget. NOTE the non-monotonicity: the
backward at (256, 1536) is 30x slower than its neighbors — re-sweep after
any kernel change rather than reasoning from tile arithmetic. The
K-streaming path (k_tile < L) is the base for an ICI ring-attention
extension (SURVEY.md section 5.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from structured_alignment_vqa_tpu.ops.layers import NEG_MASK_VALUE
from structured_alignment_vqa_tpu.ops.attention import L1_NORM_EPS, SUM_NORM_EPS

LANE = 128


def _kernel(q_ref, k_ref, v_ref, kmask_ref, qmask_ref, graph_ref,
            *refs, renorm: str, dh: int, emit: str):
    """emit selects the outputs written on the last K step:

    * ``"out"``     — the finished attention output only (inference: the
                      per-row stats are dead and Pallas outputs can't be
                      DCE'd, so they must not exist).
    * ``"stats"``   — output + per-row (m, z, b) stats for the hand-derived
                      backward (the custom_vjp fwd path).
    * ``"partial"`` — the *raw* accumulators (a, m, z, b), no renorm division
                      and no query-mask multiply: the caller merges partials
                      across K shards (ring attention) and finishes there.
    """
    m_acc, z_acc, b_acc, a_acc = refs[-4:]
    outs = refs[:-4]
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        m_acc[...] = jnp.full_like(m_acc, -jnp.inf)
        z_acc[...] = jnp.zeros_like(z_acc)
        b_acc[...] = jnp.zeros_like(b_acc)
        a_acc[...] = jnp.zeros_like(a_acc)

    q = q_ref[0, 0]       # (TQ, dh)
    k = k_ref[0, 0]       # (TK, dh)
    v = v_ref[0, 0]       # (TK, dh)
    km = kmask_ref[0]     # (1, TK)
    g = graph_ref[0]      # (TQ, TK)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / (dh ** 0.5))
    s = jnp.where(km == 0.0, NEG_MASK_VALUE, s)

    m_prev = m_acc[...]                        # (TQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)            # rescale old accumulators
    p = jnp.exp(s - m_new)                     # (TQ, TK)
    pg = p * g

    m_acc[...] = m_new
    z_acc[...] = z_acc[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    b_acc[...] = b_acc[...] * alpha + jnp.sum(pg, axis=-1, keepdims=True)
    a_acc[...] = a_acc[...] * alpha + jax.lax.dot_general(
        pg.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _():
        a = a_acc[...]
        b = b_acc[...]
        z = z_acc[...]
        if emit == "partial":
            out_ref, m_out, z_out, b_out = outs
            out_ref[0, 0] = a
            m_out[0, 0] = m_acc[...]
            z_out[0, 0] = z
            b_out[0, 0] = b
        else:
            qm = qmask_ref[0].reshape(-1, 1)   # (TQ, 1)
            if renorm == "l1":
                out = a / jnp.maximum(b, L1_NORM_EPS * z)
            else:
                out = a / (b + SUM_NORM_EPS * z)
            outs[0][0, 0] = (out * qm).astype(outs[0].dtype)
            if emit == "stats":
                # per-row softmax stats for the hand-derived backward
                _, m_out, z_out, b_out = outs
                m_out[0, 0] = m_acc[...]
                z_out[0, 0] = z
                b_out[0, 0] = b


# default K tile cap: keeps score + graph tiles (q_tile*k_tile*4 bytes each)
# near 2 MB apiece — measured sweet spot; q_tile=512 spills VMEM
MAX_K_TILE = 2048


def _flash_forward(q, k, v, key_mask, query_mask, graph, num_heads: int, renorm: str,
                   q_tile: int = 128, k_tile: int | None = None, interpret: bool = False,
                   emit: str = "stats"):
    """Run the forward kernel. Returns ``(out, m, z, b)``.

    emit="out":     out is (B, L, C) in q.dtype; stats are None.
    emit="stats":   out is (B, L, C); stats are (B, H, Lq_pad, 1) f32.
    emit="partial": out is the raw (B, H, Lq_pad, dh) f32 accumulator (no
                    renorm division, no query-mask); stats as above. K may be
                    shorter than L (a ring shard); the q/k lengths pad
                    independently.
    """
    b, l, c = q.shape
    lk_in = k.shape[1]
    dh = c // num_heads
    if k_tile is None:
        k_tile = min(((lk_in + LANE - 1) // LANE) * LANE, MAX_K_TILE)
    lq = ((l + q_tile - 1) // q_tile) * q_tile
    lk = ((lk_in + k_tile - 1) // k_tile) * k_tile

    def pad(x, axis, size):
        if x.shape[axis] == size:
            return x
        w = [(0, 0)] * x.ndim
        w[axis] = (0, size - x.shape[axis])
        return jnp.pad(x, w)

    # head-split so every block's trailing dim equals the full array dim
    # (Mosaic requires last-two block dims divisible by (8, 128) or full)
    def split(x, size):
        x = pad(x, 1, size)
        return x.reshape(b, size, num_heads, dh).transpose(0, 2, 1, 3)  # (B,H,L,dh)

    qp = split(q, lq)
    kp = split(k, lk)
    vp = split(v, lk)
    km = pad(key_mask.astype(jnp.float32).reshape(b, 1, lk_in), 2, lk)
    qm = pad(query_mask.astype(jnp.float32).reshape(b, 1, l), 2, lq)
    g = pad(pad(graph.astype(jnp.float32), 1, lq), 2, lk)

    nq = lq // q_tile
    nk = lk // k_tile
    kernel = functools.partial(_kernel, renorm=renorm, dh=dh, emit=emit)

    out_dtype = jnp.float32 if emit == "partial" else q.dtype
    out_spec = pl.BlockSpec((1, 1, q_tile, dh), lambda ib, iq, h, ik: (ib, h, iq, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, q_tile, 1), lambda ib, iq, h, ik: (ib, h, iq, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, num_heads, lq, dh), out_dtype)
    stat_shape = jax.ShapeDtypeStruct((b, num_heads, lq, 1), jnp.float32)
    if emit == "out":
        out_specs, out_shapes = (out_spec,), (out_shape,)
    else:
        out_specs = (out_spec, stat_spec, stat_spec, stat_spec)
        out_shapes = (out_shape, stat_shape, stat_shape, stat_shape)

    call = pl.pallas_call(
        kernel,
        grid=(b, nq, num_heads, nk),
        in_specs=[
            pl.BlockSpec((1, 1, q_tile, dh), lambda ib, iq, h, ik: (ib, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_tile, dh), lambda ib, iq, h, ik: (ib, h, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_tile, dh), lambda ib, iq, h, ik: (ib, h, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_tile), lambda ib, iq, h, ik: (ib, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile), lambda ib, iq, h, ik: (ib, 0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, k_tile), lambda ib, iq, h, ik: (ib, iq, ik),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((q_tile, 1), jnp.float32),
            pltpu.VMEM((q_tile, 1), jnp.float32),
            pltpu.VMEM((q_tile, 1), jnp.float32),
            pltpu.VMEM((q_tile, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * num_heads * lq * lk * dh,
            bytes_accessed=(3 * b * lk * c + b * lq * lk) * 2,
            transcendentals=b * num_heads * lq * lk,
        ),
        interpret=interpret,
    )
    res = call(qp, kp, vp, km, qm, g)
    if emit == "out":
        out, m_stat, z_stat, b_stat = res[0], None, None, None
    else:
        out, m_stat, z_stat, b_stat = res
    if emit == "partial":
        return out, m_stat, z_stat, b_stat   # padded (B, H, Lq, dh) f32

    # (B, H, Lq, dh) -> (B, L, C) with the channel-chunk head layout
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, c)
    return out[:, :l, :], m_stat, z_stat, b_stat


def _composite(q, k, v, key_mask, query_mask, graph, num_heads, renorm):
    from structured_alignment_vqa_tpu.ops.attention import attention_core

    out, _ = attention_core(
        q, k, v, key_mask=key_mask, query_mask=query_mask,
        num_heads=num_heads, graph=graph, renorm=renorm,
    )
    return out


def _composite_chunked(q, k, v, key_mask, query_mask, graph, num_heads, renorm,
                       k_chunk: int = 512):
    """The same online recurrence in plain XLA, scanned over K chunks with a
    rematerialized body — the backward's working set is O(L * k_chunk) instead
    of the (B, H, L, L) tensors XLA autodiff of the monolithic op keeps.

    Mathematically identical to :func:`_composite` (same cancellation of the
    softmax normalizer); used as the VJP target for long sequences.
    """
    b, l, c = q.shape
    dh = c // num_heads
    nk = (l + k_chunk - 1) // k_chunk
    lk = nk * k_chunk

    def pad(x, axis):
        w = [(0, 0)] * x.ndim
        w[axis] = (0, lk - x.shape[axis])
        return jnp.pad(x, w) if lk != x.shape[axis] else x

    def split_heads(x, length):
        return x.reshape(b, length, num_heads, dh).transpose(0, 2, 1, 3)

    qh = split_heads(q, l).astype(jnp.float32)                      # (B,H,L,dh)
    kh = split_heads(pad(k, 1), lk).reshape(b, num_heads, nk, k_chunk, dh)
    vh = split_heads(pad(v, 1), lk).reshape(b, num_heads, nk, k_chunk, dh)
    kmc = pad(key_mask.astype(jnp.float32), 1).reshape(b, nk, k_chunk)
    kmc = jnp.moveaxis(kmc, 1, 0)[:, :, None, None, :]   # (nk, B, 1, 1, Tk)
    gc = pad(graph.astype(jnp.float32), 2).reshape(b, l, nk, k_chunk)

    kh = jnp.moveaxis(kh, 2, 0)          # (nk, B, H, Tk, dh)
    vh = jnp.moveaxis(vh, 2, 0)
    gc = jnp.moveaxis(gc, 2, 0)          # (nk, B, L, Tk)
    scale = 1.0 / (dh ** 0.5)

    def body(carry, tile):
        m, z, bsum, a = carry
        kt, vt, gt, kmt = tile
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kt.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(kmt == 0.0, NEG_MASK_VALUE, s)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        pg = p * gt[:, None]
        z = z * alpha + jnp.sum(p, axis=-1, keepdims=True)
        bsum = bsum * alpha + jnp.sum(pg, axis=-1, keepdims=True)
        a = a * alpha + jnp.einsum("bhqk,bhkd->bhqd", pg, vt.astype(jnp.float32),
                                   preferred_element_type=jnp.float32)
        return (m_new, z, bsum, a), None

    init = (
        jnp.full((b, num_heads, l, 1), -jnp.inf, jnp.float32),
        jnp.zeros((b, num_heads, l, 1), jnp.float32),
        jnp.zeros((b, num_heads, l, 1), jnp.float32),
        jnp.zeros((b, num_heads, l, dh), jnp.float32),
    )
    (m, z, bsum, a), _ = jax.lax.scan(
        jax.checkpoint(body), init, (kh, vh, gc, kmc)
    )
    if renorm == "l1":
        out = a / jnp.maximum(bsum, L1_NORM_EPS * z)
    else:
        out = a / (bsum + SUM_NORM_EPS * z)
    out = out * query_mask.astype(jnp.float32)[:, None, :, None]
    out = out.transpose(0, 2, 1, 3).reshape(b, l, c)
    return out.astype(q.dtype)


def _ds_tile(q, k, km, g, m, z, bsum, dn, delta, renorm: str, dh: int):
    """Recompute a score tile and apply the fused renorm+softmax backward.

    All operands are 2-D tiles: q (TQ, dh), k (TK, dh), km (1, TK),
    g (TQ, TK), per-row stats m/z/bsum/delta (TQ, 1), dn (TQ, TK).
    Returns (ds (TQ, TK) already scaled by 1/sqrt(dh), n (TQ, TK)).
    """
    scale = 1.0 / (dh ** 0.5)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(km == 0.0, NEG_MASK_VALUE, s)
    e = jnp.exp(s - m)                      # z >= 1 always (m is the row max)
    p = e / z
    if renorm == "l1":
        # >= matches max()'s tie convention: at b == eps*z the forward divides
        # by b (the first operand), so the row is "live" (ADVICE r2).
        live = (bsum >= L1_NORM_EPS * z).astype(jnp.float32)  # (TQ, 1)
        n = e * g / jnp.maximum(bsum, L1_NORM_EPS * z)
        ds = n * (dn - live * delta) - p * ((1.0 - live) * delta)
    else:
        denom = bsum + SUM_NORM_EPS * z
        n = e * g / denom
        ds = n * (dn - delta) - p * (delta * SUM_NORM_EPS * z / denom)
    ds = jnp.where(km == 0.0, 0.0, ds) * scale
    return ds, n


def _bwd_dq_kernel(q_ref, k_ref, v_ref, kmask_ref, graph_ref,
                   m_ref, z_ref, b_ref, delta_ref, do_ref,
                   dq_ref, dq_acc, *, renorm: str, dh: int):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    do = do_ref[0, 0].astype(jnp.float32)   # (TQ, dh)
    v = v_ref[0, 0]                         # (TK, dh)
    dn = jax.lax.dot_general(               # dO V^T -> (TQ, TK)
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds, _ = _ds_tile(
        q_ref[0, 0], k_ref[0, 0], kmask_ref[0], graph_ref[0],
        m_ref[0, 0], z_ref[0, 0], b_ref[0, 0], dn, delta_ref[0, 0],
        renorm, dh,
    )
    dq_acc[...] += jax.lax.dot_general(     # dS K -> (TQ, dh)
        ds, k_ref[0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, kmask_ref, graph_ref,
                    m_ref, z_ref, b_ref, delta_ref, do_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, renorm: str, dh: int):
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    do = do_ref[0, 0].astype(jnp.float32)   # (TQ, dh)
    v = v_ref[0, 0]                         # (TK, dh)
    dn = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds, n = _ds_tile(
        q_ref[0, 0], k_ref[0, 0], kmask_ref[0], graph_ref[0],
        m_ref[0, 0], z_ref[0, 0], b_ref[0, 0], dn, delta_ref[0, 0],
        renorm, dh,
    )
    dv_acc[...] += jax.lax.dot_general(     # N^T dO -> (TK, dh)
        n, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dk_acc[...] += jax.lax.dot_general(     # dS^T Q -> (TK, dh)
        ds, q_ref[0, 0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_backward(q, k, v, key_mask, query_mask, graph, out, m_stat, z_stat,
                    b_stat, dy, num_heads: int, renorm: str,
                    q_tile: int, k_tile: int | None, interpret: bool):
    """Hand-derived flash backward: returns (dq, dk, dv).

    K/V may be shorter than Q (a ring shard): q/k lengths pad independently,
    and the per-row stats must then be the *global* (all-shard-merged) ones.
    """
    b, l, c = q.shape
    lk_in = k.shape[1]
    dh = c // num_heads
    if k_tile is None:
        k_tile = min(((lk_in + LANE - 1) // LANE) * LANE, MAX_K_TILE)
    lq = ((l + q_tile - 1) // q_tile) * q_tile
    lk = ((lk_in + k_tile - 1) // k_tile) * k_tile

    def pad(x, axis, size):
        if x.shape[axis] == size:
            return x
        w = [(0, 0)] * x.ndim
        w[axis] = (0, size - x.shape[axis])
        return jnp.pad(x, w)

    def split(x, size):
        x = pad(x, 1, size)
        return x.reshape(b, size, num_heads, dh).transpose(0, 2, 1, 3)

    qm = query_mask.astype(jnp.float32)
    dO = dy.astype(jnp.float32) * qm[:, :, None]           # fold qm into dy
    # delta_i = dO_i . out_i per (batch, head, row) — the flash trick: the
    # renorm-denominator inner product collapses to a dot with the output.
    delta = jnp.sum(
        (dO * out.astype(jnp.float32)).reshape(b, l, num_heads, dh), axis=-1
    ).transpose(0, 2, 1)[..., None]                        # (B, H, L, 1)
    delta = pad(delta, 2, lq)

    qp = split(q, lq)
    kp = split(k, lk)
    vp = split(v, lk)
    dop = split(dO.astype(q.dtype), lq)
    km = pad(key_mask.astype(jnp.float32).reshape(b, 1, lk_in), 2, lk)
    g = pad(pad(graph.astype(jnp.float32), 1, lq), 2, lk)

    nq = lq // q_tile
    nk = lk // k_tile

    # dQ: grid (b, nq, h, nk) — q-indexed blocks follow dim 1, k-indexed dim 3
    q_spec = pl.BlockSpec((1, 1, q_tile, dh), lambda ib, iq, h, ik: (ib, h, iq, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, 1, k_tile, dh), lambda ib, iq, h, ik: (ib, h, ik, 0),
                          memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, q_tile, 1), lambda ib, iq, h, ik: (ib, h, iq, 0),
                             memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, renorm=renorm, dh=dh),
        grid=(b, nq, num_heads, nk),
        in_specs=[
            q_spec, k_spec, k_spec,
            pl.BlockSpec((1, 1, k_tile), lambda ib, iq, h, ik: (ib, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, k_tile), lambda ib, iq, h, ik: (ib, iq, ik),
                         memory_space=pltpu.VMEM),
            stat_spec, stat_spec, stat_spec, stat_spec,
            q_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, q_tile, dh), lambda ib, i0, h, i1: (ib, h, i0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, lq, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((q_tile, dh), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * num_heads * lq * lk * dh,
            bytes_accessed=(4 * b * lk * c + b * lq * lk) * 2,
            transcendentals=b * num_heads * lq * lk,
        ),
        interpret=interpret,
    )(qp, kp, vp, km, g, m_stat, z_stat, b_stat, delta, dop)

    # dK/dV: grid (b, nk, h, nq) — q-indexed blocks follow dim 3, k-indexed dim 1
    stat_spec_kv = pl.BlockSpec((1, 1, q_tile, 1), lambda ib, i0, h, i1: (ib, h, i1, 0),
                                memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, renorm=renorm, dh=dh),
        grid=(b, nk, num_heads, nq),
        in_specs=[
            pl.BlockSpec((1, 1, q_tile, dh), lambda ib, i0, h, i1: (ib, h, i1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_tile, dh), lambda ib, i0, h, i1: (ib, h, i0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_tile, dh), lambda ib, i0, h, i1: (ib, h, i0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_tile), lambda ib, i0, h, i1: (ib, 0, i0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, k_tile), lambda ib, i0, h, i1: (ib, i1, i0),
                         memory_space=pltpu.VMEM),
            stat_spec_kv, stat_spec_kv, stat_spec_kv, stat_spec_kv,
            pl.BlockSpec((1, 1, q_tile, dh), lambda ib, i0, h, i1: (ib, h, i1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, k_tile, dh), lambda ib, i0, h, i1: (ib, h, i0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_tile, dh), lambda ib, i0, h, i1: (ib, h, i0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, num_heads, lk, dh), k.dtype),
            jax.ShapeDtypeStruct((b, num_heads, lk, dh), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((k_tile, dh), jnp.float32),
            pltpu.VMEM((k_tile, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * b * num_heads * lq * lk * dh,
            bytes_accessed=(4 * b * lk * c + b * lq * lk) * 2,
            transcendentals=b * num_heads * lq * lk,
        ),
        interpret=interpret,
    )(qp, kp, vp, km, g, m_stat, z_stat, b_stat, delta, dop)

    def merge(x, size, trim):
        return x.transpose(0, 2, 1, 3).reshape(b, size, c)[:, :trim, :]

    return merge(dq, lq, l), merge(dk, lk, lk_in), merge(dv, lk, lk_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def flash_graph_attention(q, k, v, key_mask, query_mask, graph,
                          num_heads: int, renorm: str = "l1",
                          q_tile: int = 128, k_tile: int | None = None,
                          interpret: bool = False):
    """K-blocked fused graph attention; exact, single pass, O(L) memory."""
    out, _, _, _ = _flash_forward(q, k, v, key_mask, query_mask, graph,
                                  num_heads, renorm, q_tile, k_tile, interpret,
                                  emit="out")
    return out


def _fwd(q, k, v, key_mask, query_mask, graph, num_heads, renorm, q_tile, k_tile, interpret):
    out, m_stat, z_stat, b_stat = _flash_forward(
        q, k, v, key_mask, query_mask, graph, num_heads, renorm, q_tile,
        k_tile, interpret,
    )
    return out, (q, k, v, key_mask, query_mask, graph, out, m_stat, z_stat, b_stat)


def _bwd(num_heads, renorm, q_tile, k_tile, interpret, res, dy):
    q, k, v, key_mask, query_mask, graph, out, m_stat, z_stat, b_stat = res
    dq, dk, dv = _flash_backward(
        q, k, v, key_mask, query_mask, graph, out, m_stat, z_stat, b_stat,
        dy, num_heads, renorm, q_tile, k_tile, interpret,
    )
    return dq, dk, dv, None, None, None


flash_graph_attention.defvjp(_fwd, _bwd)

"""Fused graph-guided attention — the Pallas kernel tier.

The reference's core op (`modules.py:210-311`) materializes the (h*N, T, T)
attention tensor in HBM several times (scores, masked scores, softmax, graph
product, renormalized weights). This kernel fuses the whole chain

    QK^T -> scale -> key-mask fill -> softmax -> x graph -> renorm -> x query-mask -> @V

into one VMEM-resident pass per (batch, head) grid cell: the (L, L) attention
matrix never touches HBM. At the production operating point (L <= 512,
Dh = 64) a full (L, L) f32 tile plus Q/K/V slabs is well under the ~16 MB VMEM
budget, so no inner K-blocking is needed.

Backward: a hand-derived Pallas kernel (`pallas_attention_bwd.py`) when
``USE_KERNEL_BWD`` is set, else XLA autodiff of the composite implementation
in `attention.py` (identical math) via ``jax.custom_vjp``.

Usage: gate via ``ModelConfig.use_pallas_attention``; the wrapper pads L to
the TPU lane width and slices back, which is exact because padded key columns
carry a zero key-mask (softmax mass exp(-2^32) == 0) and padded query rows are
zeroed by the query mask before the V matmul.

Measured guidance (v5e, hidden 512, 8 heads, bs 128): on *lane-aligned*
sequence lengths XLA's batched fusion of the composite op is faster than
this per-batch kernel — attention core 0.75 vs 0.89 ms at L=128, whole-model
train step 79.7 vs 87.7 ms even with the hand-derived backward — so
``ModelConfig.use_pallas_attention`` defaults to False. The roofline reason
(docs/DESIGN.md "Kernel tier at lane-aligned shapes"): at L=128 the (L, L)
tile is small enough that XLA already keeps the softmax chain fused around
*batched* MXU matmuls, while this kernel's per-batch grid runs 8 sequential
64-wide per-head dots that half-fill MXU tiles. The kernel wins when shapes
are not aligned (21.1 vs 29.3 ms at L=158) — i.e. when the data pipeline
cannot bucket to 128-multiples — and is the platform for fusions XLA cannot
express (the LN epilogue lives here already). For L > 512 the flash kernel
(`pallas_flash_attention.py`) takes over and wins outright.
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

# Flip to True to run the kernel through the Pallas interpreter (CPU tests).
INTERPRET_MODE = False


def _kernel(q_ref, k_ref, v_ref, kmask_ref, qmask_ref, graph_ref, res_ref,
            gamma_ref, beta_ref, out_ref, *, num_heads: int, renorm: str,
            fuse_ln: bool):
    """One batch element: all heads, fused, VMEM-resident.

    Processing every head in one program amortizes the (L, L) graph load
    (shared across heads) and keeps per-program work large enough to hide
    DMA behind compute.
    """
    q = q_ref[0]          # (L, C)
    k = k_ref[0]          # (L, C)
    v = v_ref[0]          # (L, C)
    km = kmask_ref[0]     # (1, L) 0/1
    qm = qmask_ref[0]     # (1, L)
    graph = graph_ref[0]  # (L, L)

    c = q.shape[-1]
    dh = c // num_heads
    scale = 1.0 / (dh ** 0.5)
    key_fill = km == 0.0                  # (1, L), broadcasts over query rows
    qcol = qm.reshape(-1, 1)

    head_outs = []
    for h in range(num_heads):            # static unroll; channel-chunk heads
        sl = slice(h * dh, (h + 1) * dh)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                         # (L, L)
        scores = jnp.where(key_fill, NEG_MASK_VALUE, scores)
        att = jax.nn.softmax(scores, axis=-1)
        att = att * graph
        if renorm == "l1":
            norm = jnp.sum(jnp.abs(att), axis=-1, keepdims=True)
            att = att / jnp.maximum(norm, L1_NORM_EPS)
        elif renorm == "sum_eps":
            att = att / (jnp.sum(att, axis=-1, keepdims=True) + SUM_NORM_EPS)
        att = att * qcol
        out = jax.lax.dot_general(
            att.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        head_outs.append(out)
    acc = jnp.concatenate(head_outs, axis=-1)

    if fuse_ln:
        # residual + the reference LayerNorm (eps on std, unbiased variance —
        # `modules.py:62-65`), fused so the attention output never round-trips
        # to HBM before normalization
        x = acc + res_ref[0].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / max(c - 1, 1)
        nonzero = var > 0.0
        std = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, var, 1.0)), 0.0)
        x = gamma_ref[0] * (x - mean) / (std + 1e-8) + beta_ref[0]
        out_ref[0] = x.astype(out_ref.dtype)
    else:
        out_ref[0] = acc.astype(out_ref.dtype)


def _pad_to(x: jax.Array, axis: int, size: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fused_forward(q, k, v, key_mask, query_mask, graph, num_heads: int, renorm: str,
                   residual=None, gamma=None, beta=None):
    """q/k/v: (B, L, C); key/query_mask: (B, L); graph: (B, L, L) -> (B, L, C).

    When ``residual``/``gamma``/``beta`` are given, the residual add and
    reference LayerNorm are fused into the kernel epilogue.
    """
    b, l, c = q.shape
    lp = ((l + LANE - 1) // LANE) * LANE
    fuse_ln = residual is not None

    qp = _pad_to(q, 1, lp)
    kp = _pad_to(k, 1, lp)
    vp = _pad_to(v, 1, lp)
    km = _pad_to(key_mask.astype(jnp.float32).reshape(b, 1, l), 2, lp)
    qm = _pad_to(query_mask.astype(jnp.float32).reshape(b, 1, l), 2, lp)
    g = _pad_to(_pad_to(graph.astype(jnp.float32), 1, lp), 2, lp)
    res = _pad_to(residual, 1, lp) if fuse_ln else jnp.zeros((b, 1, c), q.dtype)
    res_l = lp if fuse_ln else 1
    gam = (gamma if fuse_ln else jnp.ones((c,), jnp.float32)).reshape(1, c)
    bet = (beta if fuse_ln else jnp.zeros((c,), jnp.float32)).reshape(1, c)

    kernel = functools.partial(_kernel, num_heads=num_heads, renorm=renorm, fuse_ln=fuse_ln)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, lp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, res_l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lp, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * lp * lp * c,
            bytes_accessed=(4 * b * lp * c + b * lp * lp) * 4,
            transcendentals=b * num_heads * lp * lp,
        ),
        interpret=INTERPRET_MODE,
    )(qp, kp, vp, km, qm, g, res, gam, bet)

    return out[:, :l, :]


def _composite(q, k, v, key_mask, query_mask, graph, num_heads: int, renorm: str):
    """XLA reference path (identical math) used for the backward pass."""
    from structured_alignment_vqa_tpu.ops.attention import attention_core

    out, _ = attention_core(
        q, k, v, key_mask=key_mask, query_mask=query_mask,
        num_heads=num_heads, graph=graph, renorm=renorm,
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_graph_attention(q, k, v, key_mask, query_mask, graph, num_heads: int, renorm: str = "l1"):
    """Fused self-attention with graph renorm; differentiable (composite bwd)."""
    return _fused_forward(q, k, v, key_mask, query_mask, graph, num_heads, renorm)


def _fga_fwd(q, k, v, key_mask, query_mask, graph, num_heads, renorm):
    out = _fused_forward(q, k, v, key_mask, query_mask, graph, num_heads, renorm)
    return out, (q, k, v, key_mask, query_mask, graph)


def _fga_bwd(num_heads, renorm, res, g):
    q, k, v, key_mask, query_mask, graph = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _composite(q_, k_, v_, key_mask, query_mask, graph, num_heads, renorm),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None, None


fused_graph_attention.defvjp(_fga_fwd, _fga_bwd)


def _composite_ln(q, k, v, key_mask, query_mask, graph, residual, gamma, beta,
                  num_heads, renorm):
    from structured_alignment_vqa_tpu.ops.layers import layer_norm

    out = _composite(q, k, v, key_mask, query_mask, graph, num_heads, renorm)
    return layer_norm(out + residual, gamma, beta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_graph_attention_ln(q, k, v, key_mask, query_mask, graph, residual,
                             gamma, beta, num_heads: int, renorm: str = "l1"):
    """Fused attention + residual + reference LayerNorm epilogue."""
    return _fused_forward(q, k, v, key_mask, query_mask, graph, num_heads, renorm,
                          residual=residual, gamma=gamma, beta=beta)


def _fgal_fwd(q, k, v, key_mask, query_mask, graph, residual, gamma, beta,
              num_heads, renorm):
    out = fused_graph_attention_ln(
        q, k, v, key_mask, query_mask, graph, residual, gamma, beta, num_heads, renorm
    )
    return out, (q, k, v, key_mask, query_mask, graph, residual, gamma, beta)


# Use the hand-derived Pallas backward kernel (pallas_attention_bwd.py) instead
# of XLA autodiff over the composite. Flip off to fall back.
USE_KERNEL_BWD = True


def _fgal_bwd(num_heads, renorm, res, g):
    q, k, v, key_mask, query_mask, graph, residual, gamma, beta = res
    if USE_KERNEL_BWD:
        from structured_alignment_vqa_tpu.ops.pallas_attention_bwd import (
            fused_attention_bwd,
        )

        dq, dk, dv, dr, dga, dbe = fused_attention_bwd(
            q, k, v, key_mask, query_mask, graph, residual, gamma, beta,
            g, num_heads, renorm, fuse_ln=True, interpret=INTERPRET_MODE,
        )
        return dq, dk, dv, None, None, None, dr, dga, dbe
    _, vjp = jax.vjp(
        lambda q_, k_, v_, r_, ga_, be_: _composite_ln(
            q_, k_, v_, key_mask, query_mask, graph, r_, ga_, be_, num_heads, renorm
        ),
        q, k, v, residual, gamma, beta,
    )
    dq, dk, dv, dr, dga, dbe = vjp(g)
    return dq, dk, dv, None, None, None, dr, dga, dbe


fused_graph_attention_ln.defvjp(_fgal_fwd, _fgal_bwd)

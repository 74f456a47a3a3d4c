"""Fused position-wise FFN kernel: LN(W2·relu(W1·x + b1) + b2 + x).

The composite FFN (`ops/layers.py:FeedForward`, mirroring `modules.py:405-447`)
materializes the (B, L, 4C) hidden activation in HBM between the two matmuls —
at the production operating point that is ~64 MB per block per direction. This
kernel keeps the hidden activation in VMEM: one grid cell per batch element,
weights fetched once (their block index is constant across the grid, so Mosaic
leaves them resident).

Backward = XLA autodiff of the composite (identical math) via custom_vjp,
matching the strategy of `pallas_attention.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# Shares the interpreter switch with the attention kernel so tests flip one flag.
from structured_alignment_vqa_tpu.ops import pallas_attention as _pa


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, beta_ref, out_ref):
    x = x_ref[...]                    # (ROWS, C)
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[0]
    h = jnp.maximum(h, 0.0)
    y = jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    y = y + x.astype(jnp.float32)

    c = y.shape[-1]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.sum(jnp.square(y - mean), axis=-1, keepdims=True) / max(c - 1, 1)
    nonzero = var > 0.0
    std = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, var, 1.0)), 0.0)
    out = gamma_ref[0] * (y - mean) / (std + 1e-8) + beta_ref[0]
    out_ref[...] = out.astype(out_ref.dtype)


# Rows per grid cell: the FFN (and the row-wise LayerNorm) has no cross-row
# coupling, so the (B, L, C) input is flattened to (B*L, C) and tiled in
# large row blocks — big MXU matmuls, weights resident across the grid.
ROW_TILE = 1024


def _fused_forward(x, w1, b1, w2, b2, gamma, beta):
    b, l, c = x.shape
    hdim = w1.shape[1]
    n = b * l
    np_ = ((n + ROW_TILE - 1) // ROW_TILE) * ROW_TILE
    x2 = x.reshape(n, c)
    if np_ != n:
        x2 = jnp.pad(x2, ((0, np_ - n), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(np_ // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * np_ * c * hdim,
            bytes_accessed=(2 * np_ * c) * 2 + (2 * c * hdim) * 2,
            transcendentals=0,
        ),
        interpret=_pa.INTERPRET_MODE,
    )(x2, w1, b1.reshape(1, hdim), w2, b2.reshape(1, c),
      gamma.reshape(1, c), beta.reshape(1, c))
    return out[:n].reshape(b, l, c)


def _composite(x, w1, b1, w2, b2, gamma, beta):
    from structured_alignment_vqa_tpu.ops.layers import layer_norm

    h = jax.nn.relu(jnp.matmul(x, w1.astype(x.dtype)) + b1.astype(x.dtype))
    y = jnp.matmul(h, w2.astype(x.dtype)) + b2.astype(x.dtype)
    return layer_norm(y + x, gamma, beta)


@jax.custom_vjp
def fused_ffn(x, w1, b1, w2, b2, gamma, beta):
    """Fused FFN + residual + reference LayerNorm; composite backward."""
    return _fused_forward(x, w1, b1, w2, b2, gamma, beta)


def _fwd(x, w1, b1, w2, b2, gamma, beta):
    return _fused_forward(x, w1, b1, w2, b2, gamma, beta), (x, w1, b1, w2, b2, gamma, beta)


def _bwd(res, g):
    return jax.vjp(_composite, *res)[1](g)


fused_ffn.defvjp(_fwd, _bwd)

"""Core non-attention primitives.

TPU-native re-implementations of the reference primitive layer
(`/root/reference/models/modules.py`). Numerics quirks of the reference that
downstream parity depends on are preserved deliberately and called out inline:

* LayerNorm adds epsilon to the *standard deviation* (not the variance) and the
  std is the unbiased (N-1) estimator — `modules.py:62-65`.
* The feed-forward block is Linear(d->4d)+ReLU -> Linear(4d->d) with residual
  and post-LayerNorm — `modules.py:428-446`.
* Embedding optionally zeroes row 0 and scales by sqrt(d) — `modules.py:13-46`.
* Label smoothing is `(1-eps)*y + eps/K` with eps=0.1 — `modules.py:450-463`.

All functions are pure; flax modules only own parameters and delegate to the
functional cores so the Pallas kernel tier can reuse the exact same math.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Mask fill value used across the reference attention family
# (`modules.py:168,261,357`): float(-2**32 + 1).
NEG_MASK_VALUE = float(-(2**32) + 1)


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array, epsilon: float = 1e-8) -> jax.Array:
    """LayerNorm with the reference's epsilon-on-std quirk.

    ``gamma * (x - mean) / (std + eps) + beta`` where ``std`` is the *unbiased*
    standard deviation over the last axis (torch ``x.std(-1)`` divides by N-1).
    Mirrors `modules.py:62-65`.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum(jnp.square(x32 - mean), axis=-1, keepdims=True) / max(n - 1, 1)
    # Double-where guard: sqrt' at var=0 is inf, which turns the (x-mean)=0
    # factor into NaN gradients on exactly-constant rows (e.g. all-padding
    # rows at zero-bias init). Forward value is unchanged (std=0 there, as in
    # torch); the gradient becomes the correct 0 subgradient.
    nonzero = var > 0.0
    std = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, var, 1.0)), 0.0)
    out = gamma * (x32 - mean) / (std + epsilon) + beta
    return out.astype(x.dtype)


def label_smoothing(one_hot: jax.Array, epsilon: float = 0.1) -> jax.Array:
    """`(1 - eps) * y + eps / K` over the last axis (`modules.py:461-463`)."""
    k = one_hot.shape[-1]
    return (1.0 - epsilon) * one_hot + epsilon / k


def sinusoidal_position_encoding(
    batch: int, length: int, num_units: int, zeros_pad: bool = True, scale: bool = True
) -> jax.Array:
    """Sinusoidal PE table lookup for positions [0, length).

    Mirrors `modules.py:83-116`: ``pos / 10000**(2i/d)`` with sin on even and
    cos on odd columns, optional zeroed row 0, optional sqrt(d) scaling. The
    production model uses learned PEs instead; this exists for the `--sinusoid`
    flag and the ablation variants.
    """
    pos = np.arange(length)[:, None].astype(np.float64)
    i = np.arange(num_units)[None, :].astype(np.float64)
    angle = pos / np.power(10000.0, 2.0 * i / num_units)
    table = np.where(np.arange(num_units)[None, :] % 2 == 0, np.sin(angle), np.cos(angle))
    if zeros_pad:
        table[0, :] = 0.0
    table = jnp.asarray(table, dtype=jnp.float32)
    if scale:
        table = table * (num_units ** 0.5)
    return jnp.broadcast_to(table[None], (batch, length, num_units))


class LayerNorm(nn.Module):
    """Parameterized wrapper over :func:`layer_norm` (gamma init 1, beta init 0)."""

    features: int
    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.features,), jnp.float32)
        return layer_norm(x, gamma, beta, self.epsilon)


class LNParams(nn.Module):
    """Bare gamma/beta parameters (tree-compatible with :class:`LayerNorm`)."""

    features: int

    @nn.compact
    def __call__(self):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.features,), jnp.float32)
        return gamma, beta


class _DenseParams(nn.Module):
    """Bare Dense parameters (tree-compatible with ``nn.Dense``)."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.fin, self.fout), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.fout,), jnp.float32)
        return kernel, bias


class FeedForward(nn.Module):
    """Position-wise FFN with residual + post-LN (`modules.py:405-447`).

    ``Linear(in, units[0]) + ReLU -> Linear(units[0], units[1])`` then residual
    add and LayerNorm. ``units`` defaults to ``[4*d, d]`` at call sites.
    ``use_pallas`` routes sequence inputs through the fused VMEM-resident
    kernel (`ops/pallas_ffn.py`) so the (B, L, 4d) hidden never hits HBM.
    """

    in_features: int
    hidden_units: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k1, b1 = _DenseParams(self.in_features, self.hidden_units[0], name="fc1")()
        k2, b2 = _DenseParams(self.hidden_units[0], self.hidden_units[1], name="fc2")()
        gamma, beta = LNParams(self.in_features, name="ln")()

        if self.use_pallas and x.ndim == 3 and x.shape[1] > 8:
            from structured_alignment_vqa_tpu.ops.pallas_ffn import fused_ffn

            dt = self.dtype
            return fused_ffn(
                x.astype(dt), k1.astype(dt), b1.astype(dt),
                k2.astype(dt), b2.astype(dt), gamma, beta,
            )

        h = jax.nn.relu(jnp.matmul(x.astype(self.dtype), k1.astype(self.dtype)) + b1.astype(self.dtype))
        h = jnp.matmul(h, k2.astype(self.dtype)) + b2.astype(self.dtype)
        return layer_norm(h + x, gamma, beta)


class Embedding(nn.Module):
    """Learned lookup table with optional zeroed row 0 and sqrt(d) scale.

    Mirrors `modules.py:13-46` (xavier-normal init; the zero row is enforced on
    every lookup rather than only at init so optimizer updates cannot
    resurrect it, matching torch's `padding_idx=0` no-grad semantics closely
    enough for training parity).
    """

    vocab_size: int
    num_units: int
    zeros_pad: bool = True
    scale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param(
            "lookup_table",
            nn.initializers.xavier_normal(),
            (self.vocab_size, self.num_units),
            jnp.float32,
        )
        if self.zeros_pad:
            table = table.at[0].set(0.0)
        out = jnp.take(table, ids, axis=0).astype(self.dtype)
        if self.scale:
            out = out * math.sqrt(self.num_units)
        return out

"""Compact Bilinear Pooling (MCB fusion head) on jnp.fft.

TPU-native equivalent of `/root/reference/models/AttModel_x3.py:444-469`,
which still used the legacy ``torch.rfft``/``torch.irfft`` API. The math is
count-sketch projection of both inputs followed by circular convolution in the
frequency domain, signed square root, and L2 normalization.

Quirks preserved:
* The legacy ``torch.irfft`` divides by n, and the reference multiplies the
  result by ``output_dim`` to undo it; ``jnp.fft.irfft`` has the same 1/n
  normalization so we keep the ``* output_dim``.
* L2 normalization runs over **dim=0** (the batch axis) — `AttModel_x3.py:468`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def count_sketch_matrix(
    rng: np.random.Generator, input_dim: int, output_dim: int
) -> np.ndarray:
    """Dense (input_dim, output_dim) count-sketch: one random +-1 per input row.

    Mirrors the sparse-then-densified construction at `AttModel_x3.py:451-459`
    (random target column h(i), random sign s(i)); frozen, not trained.
    """
    h = rng.integers(0, output_dim, size=(input_dim,))
    s = 2 * rng.integers(0, 2, size=(input_dim,)) - 1
    m = np.zeros((input_dim, output_dim), dtype=np.float32)
    m[np.arange(input_dim), h] = s.astype(np.float32)
    return m


def compact_bilinear_pooling(
    x1: jax.Array, x2: jax.Array, sketch1: jax.Array, sketch2: jax.Array, output_dim: int
) -> jax.Array:
    """FFT-domain circular convolution of the two sketched inputs.

    x1, x2: (..., D_in); sketches: (D_in, output_dim). Returns (..., output_dim).
    """
    f1 = jnp.fft.rfft(jnp.matmul(x1.astype(jnp.float32), sketch1), axis=-1)
    f2 = jnp.fft.rfft(jnp.matmul(x2.astype(jnp.float32), sketch2), axis=-1)
    cbp = jnp.fft.irfft(f1 * f2, n=output_dim, axis=-1) * output_dim
    signed_sqrt = jnp.sqrt(jax.nn.relu(cbp)) - jnp.sqrt(jax.nn.relu(-cbp))
    # L2-normalize over the batch axis (dim=0), clamping the norm at 1e-12 as
    # F.normalize does (`AttModel_x3.py:468`).
    norm = jnp.sqrt(jnp.sum(jnp.square(signed_sqrt), axis=0, keepdims=True))
    return signed_sqrt / jnp.maximum(norm, 1e-12)

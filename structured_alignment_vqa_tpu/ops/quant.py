"""int8 weight-only serving quantization.

The serving memory/bandwidth budget is dominated by the GloVe-backed
embedding tables — 407k x 300 f32 is ~0.5 GB per table, three tables when
``share_glove`` is off (`AttModel_x3.py:36-41,171,314`) — plus the classifier
heads. Weight-only int8 stores those weights as int8 with float32 scales and
dequantizes at the use site, so:

* embedding lookups gather int8 rows (4x less HBM traffic per lookup) and
  apply the per-row scale to the gathered rows only — the full table is never
  dequantized;
* classifier matmuls feed int8-converted weights straight into the MXU in the
  compute dtype; the per-output-channel scale commutes with the contraction
  (``sum_i x_i q_ij s_j = s_j sum_i x_i q_ij``), so it is applied once to the
  (small) output.

Quantization is symmetric (no zero point): ``q = round(w / s)`` with
``s = amax(|w|) / 127`` per row (embeddings) or per output channel (dense
kernels). Activations stay in the compute dtype — this is weight-only
compression, the matmul numerics are unchanged bf16/f32 MXU accumulation.

Training is untouched: a trained float checkpoint is converted once with
`quantize_params`, and the model is instantiated with
``ModelConfig.int8_serving=True`` so `GloVeEmbed` / the classifier heads
declare the quantized parameter layout. Accuracy impact is bounded by test
(`tests/test_quant.py`) and measured on fixtures (docs/DESIGN.md).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def quantize_int8(w: np.ndarray, axis: int) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric int8 quantization with one scale per slice along ``axis``.

    Returns ``(q, scale)`` with ``q`` int8 of w's shape and ``scale`` float32
    of shape ``(w.shape[axis],)`` such that ``w ~= q * scale`` broadcast along
    ``axis``. All-zero slices get scale 1 (q is all-zero anyway) so the
    dequantized table keeps exact zeros — e.g. embedding rows never written
    by the GloVe graft.
    """
    w = np.asarray(w, np.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    amax = np.max(np.abs(w), axis=reduce_axes)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    shape = [1] * w.ndim
    shape[axis] = -1
    q = np.clip(np.rint(w / scale.reshape(shape)), -127, 127).astype(np.int8)
    return q, scale


class QDense(nn.Module):
    """Weight-only int8 linear layer (drop-in for ``nn.Dense`` at serving).

    Parameters come from `quantize_params`, not training: ``kernel_q`` int8
    ``(in, features)``, ``kernel_scale`` f32 ``(features,)``, ``bias`` f32.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kq = self.param(
            "kernel_q", nn.initializers.zeros, (x.shape[-1], self.features), jnp.int8
        )
        ks = self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kq.astype(self.dtype))
        return y * ks.astype(self.dtype) + bias.astype(self.dtype)


def quantized_lookup(q_table: jax.Array, scale: jax.Array, ids: jax.Array,
                     dtype: jnp.dtype) -> jax.Array:
    """Gather int8 rows + per-row scales, dequantize the gathered rows only."""
    rows = jnp.take(q_table, ids, axis=0).astype(dtype)
    s = jnp.take(scale, ids, axis=0).astype(dtype)
    return rows * s[..., None]


# The modules the int8_serving=True model declares quantized, by NAME (not
# structure): GloVeEmbed instances (`att_model_x3.py` — "glove" when
# share_glove, else per-branch "syb_emb") and the classifier-head Dense pairs
# ("cls"/"cls_vis"/"cls_syb"/"cls_mcb" + "_hidden"/"_out"). Matching by name
# keeps a future module that merely *looks* like a table from being silently
# mis-quantized (ADVICE r2).
GLOVE_MODULE_NAMES = frozenset({"glove", "syb_emb"})
HEAD_PREFIX = "cls"


def quantize_params(params, glove_names=GLOVE_MODULE_NAMES, head_prefix=HEAD_PREFIX):
    """Convert a trained float param tree to the int8-serving layout.

    Rewrites exactly the leaves the ``int8_serving=True`` model declares:

    * ``GloVeEmbed`` subtrees (named in ``glove_names``, sole key ``table``)
      -> ``table_q`` int8 + per-row ``table_scale``;
    * classifier-head Dense subtrees (name starting ``head_prefix``, keys
      ``kernel``/``bias``) -> ``kernel_q`` int8 + per-output-channel
      ``kernel_scale`` + the float bias.

    Everything else passes through unchanged (e.g. the decoder's
    ``lookup_table`` and the attention/FFN weights stay float — they are
    small next to the GloVe tables and sit on the training path's parity
    contract).

    Raises if a name matched a target but its structure didn't (a renamed or
    reshaped module would otherwise produce a tree the int8 model rejects
    much later), or if nothing was quantized at all.
    """
    n_tables = 0
    n_heads = 0

    def rec(tree, path):
        nonlocal n_tables, n_heads
        out = {}
        for k, v in tree.items():
            here = path + (k,)
            if isinstance(v, dict):
                if k in glove_names:
                    if set(v) != {"table"}:
                        raise ValueError(
                            f"GloVe module {'/'.join(here)} has keys "
                            f"{sorted(v)}, expected exactly ['table'] — "
                            "already quantized, or the layout changed?"
                        )
                    q, s = quantize_int8(np.asarray(v["table"]), axis=0)
                    out[k] = {"table_q": jnp.asarray(q), "table_scale": jnp.asarray(s)}
                    n_tables += 1
                elif k.startswith(head_prefix):
                    if set(v) != {"kernel", "bias"}:
                        raise ValueError(
                            f"classifier head {'/'.join(here)} has keys "
                            f"{sorted(v)}, expected ['bias', 'kernel']"
                        )
                    q, s = quantize_int8(np.asarray(v["kernel"]), axis=1)
                    out[k] = {
                        "kernel_q": jnp.asarray(q),
                        "kernel_scale": jnp.asarray(s),
                        "bias": jnp.asarray(v["bias"]),
                    }
                    n_heads += 1
                else:
                    out[k] = rec(v, here)
            else:
                # device_get'd trees carry numpy leaves; flax modules expect
                # jax arrays (e.g. Embedding's `.at[0].set`)
                out[k] = jnp.asarray(v)
        return out

    out = rec(params, ())
    # the model always has >=1 GloVe table and the 3 heads (6 Dense layers);
    # producing fewer means the tree wasn't an AttModelX3 float checkpoint
    if n_tables < 1 or n_heads < 6:
        raise ValueError(
            f"quantize_params matched {n_tables} GloVe table(s) and {n_heads} "
            "head Dense layer(s); expected >=1 and >=6 — wrong tree or "
            "renamed modules?"
        )
    return out

"""The attention family: the core ops of SA-VQA.

TPU-native equivalents of the reference's three attention classes
(`/root/reference/models/modules.py:119-403`):

* :class:`MultiHeadAttention`       — vanilla MHA used by decoder self-attention
                                      (`modules.py:119-207`).
* :class:`GraphGuidedAttention`     — softmax -> elementwise adjacency multiply ->
                                      L1 renormalization; the paper's core op
                                      (`modules.py:210-311`).
* :class:`GraphMaskAttention`       — the sum+eps renorm variant used by the
                                      x5/x6/x7 MIL ablations (`modules.py:314-403`).

Reference numerics preserved exactly (parity-critical, see SURVEY.md section 7):

* Q/K/V projections are Linear **followed by ReLU** (`modules.py:135-137`).
* Head split is channel-chunking: head h owns channels [h*Dh, (h+1)*Dh)
  (`modules.py:153-155`); we realize the same grouping via reshape.
* Key/query masks are **content-derived**: ``sign(|sum(x, -1)|)`` over the
  *unprojected* keys/queries (`modules.py:164,187`).
* Masked logits are filled with ``-2**32 + 1`` (`modules.py:168`).
* Graph renorm happens **after** softmax: L1 (``x / max(sum|x|, 1e-12)``,
  matching ``F.normalize(p=1)``) or ``x / (sum(x) + 1e-7)`` per variant.

Scores/softmax/renorm are computed in float32 regardless of the compute dtype;
the two matmuls ride the MXU with ``preferred_element_type=float32``.

A fused Pallas kernel implementing the same math for the hot (self-attention)
case lives in `pallas_attention.py`; these composite versions are the
reference/fallback and the default for irregular shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from structured_alignment_vqa_tpu.ops.layers import NEG_MASK_VALUE, LNParams, layer_norm

# F.normalize(p=1) clamps the norm at 1e-12 (`modules.py:285`).
L1_NORM_EPS = 1e-12
# The graph-mask variant renormalizes with +1e-7 on the sum (`modules.py:378`).
SUM_NORM_EPS = 1e-7


def content_mask(x: jax.Array) -> jax.Array:
    """``sign(|sum(x, -1)|)`` — the reference's content-derived padding mask.

    Rows that are exactly all-zero (padding) get 0, everything else 1.
    Computed in float32: the sum must not flush to zero in bf16.
    Mirrors `modules.py:164,187`.

    Caveat (inherited from the reference): a *real* row can be masked when its
    feature sum cancels to exactly 0.0 — post-LayerNorm rows at fresh init
    (gamma=1, beta=0) do this routinely because the mean's division by a
    power-of-two feature count is exact in fp32. Trained parameters move off
    that knife edge; tests that compare across compiled shapes perturb
    LayerNorm params first (see tests/test_train_step.py::perturb_params).
    """
    return jnp.sign(jnp.abs(jnp.sum(x.astype(jnp.float32), axis=-1)))


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, T, C) -> (B, H, T, C/H) with head h owning channels [h*Dh,(h+1)*Dh)."""
    b, t, c = x.shape
    return x.reshape(b, t, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, T, Dh) -> (B, T, H*Dh), inverse of :func:`_split_heads`."""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array,
    query_mask: jax.Array,
    num_heads: int,
    graph: Optional[jax.Array] = None,
    renorm: Optional[str] = None,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Shared attention math for all three variants.

    Args:
      q/k/v: projected inputs, (B, Tq/Tk/Tk, C).
      key_mask: (B, Tk) 0/1 content mask of the *unprojected* keys.
      query_mask: (B, Tq) 0/1 content mask of the *unprojected* queries.
      graph: optional (B, Tq, Tk) per-sample adjacency/stage mask, broadcast
        over heads (`modules.py:281-284`).
      renorm: None | 'l1' | 'sum_eps' — the post-graph renormalization.
      causal: apply a lower-triangular future mask (`modules.py:173-181`).

    Returns:
      (output (B, Tq, C), att_weights (B, H, Tq, Tk)). ``att_weights`` is the
      post-renorm, pre-query-mask tensor the reference exposes via
      ``return_att`` (`modules.py:286,309`).
    """
    b, tq, c = q.shape
    tk = k.shape[1]
    dh = c // num_heads

    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)

    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    scores = scores / (dh ** 0.5)

    km = key_mask.astype(jnp.float32)[:, None, None, :]  # (B,1,1,Tk)
    scores = jnp.where(km == 0.0, NEG_MASK_VALUE, scores)

    if causal:
        tril = jnp.tril(jnp.ones((tq, tk), dtype=jnp.float32))
        scores = jnp.where(tril[None, None] == 0.0, NEG_MASK_VALUE, scores)

    att = jax.nn.softmax(scores, axis=-1)

    if graph is not None:
        att = att * graph.astype(jnp.float32)[:, None, :, :]
    if renorm == "l1":
        norm = jnp.sum(jnp.abs(att), axis=-1, keepdims=True)
        att = att / jnp.maximum(norm, L1_NORM_EPS)
    elif renorm == "sum_eps":
        att = att / (jnp.sum(att, axis=-1, keepdims=True) + SUM_NORM_EPS)
    elif renorm is not None:
        raise ValueError(f"unknown renorm mode: {renorm!r}")

    att_weights = att

    att = att * query_mask.astype(jnp.float32)[:, None, :, None]

    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, att.shape)
        att = jnp.where(keep, att / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum(
        "bhqk,bhkd->bhqd", att.astype(vh.dtype), vh, preferred_element_type=jnp.float32
    )
    return _merge_heads(out).astype(q.dtype), att_weights


class _AttentionBase(nn.Module):
    """Shared parameter layout: ReLU'd Q/K/V Dense projections + post-LN."""

    num_units: int
    num_heads: int = 8
    dropout_rate: float = 0.0
    causality: bool = False
    return_att: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # Sequence-parallel ring attention (`ops/ring_attention.py`): the mesh
    # axis name to shard the token sequence over, or None. Engages only for
    # graph-guided self-attention when the ambient mesh (parallel/context.py)
    # has that axis with size > 1 and L divides it; falls back otherwise.
    ring_axis: Optional[str] = None
    # "ring" (ppermute K/V rotation, graph row-sharded) or "ulysses"
    # (all-to-all head sharding, graph replicated) — trade-offs in
    # docs/DESIGN.md "Ring vs Ulysses"
    seq_impl: str = "ring"

    def _project(self, queries, keys, values):
        q = jax.nn.relu(nn.Dense(self.num_units, dtype=self.dtype, name="q_proj")(queries))
        k = jax.nn.relu(nn.Dense(self.num_units, dtype=self.dtype, name="k_proj")(keys))
        v = jax.nn.relu(nn.Dense(self.num_units, dtype=self.dtype, name="v_proj")(values))
        return q, k, v

    def _ln_params(self):
        """LN params at the same tree location LayerNorm('ln') would use, so
        the fused-epilogue Pallas path and the composite path share weights."""
        return LNParams(self.num_units, name="ln")()

    def _finish(self, out, queries):
        gamma, beta = self._ln_params()
        return layer_norm(out + queries, gamma, beta)

    def _run(self, queries, keys, values, graph, renorm, deterministic):
        # Single-token self-attention (the 1-token decoder's self-attention,
        # `AttModel_x3.py:150`): softmax over one key is identically 1, so the
        # whole attention reduces to ``query_mask * V(x)`` — the Q/K
        # projections and the score matmul are dead compute. Exact under every
        # mask/renorm combination that can occur at T=1: the key-mask fill is
        # erased by the 1-element softmax, an L1/sum renorm of a single
        # positive value is (near-)identity only when graph==1, so the fast
        # path is restricted to graph-free calls.
        if (
            queries.shape[1] == 1
            and keys.shape[1] == 1
            and graph is None
            and renorm is None
            and (self.dropout_rate == 0.0 or deterministic)
        ):
            # q/k projections still run (params must exist and match the
            # general path's tree); only the score/softmax/mask chain is
            # elided. At (B, 1, C) they are a rounding error in FLOPs.
            q, k, v = self._project(queries, keys, values)
            qm = content_mask(queries)[..., None]
            out = self._finish(v * qm.astype(v.dtype), queries)
            if self.return_att:
                att = jnp.ones((queries.shape[0], self.num_heads, 1, 1), jnp.float32)
                return out, att
            return out

        q, k, v = self._project(queries, keys, values)
        rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            rng = self.make_rng("dropout")

        # Ring (sequence-sharded) path: graph-guided self-attention with the
        # token sequence sharded over a mesh axis, K/V blocks rotating over
        # ICI (SURVEY.md section 5.7's extension the reference never built).
        if (
            self.ring_axis is not None
            and graph is not None
            and renorm in ("l1", "sum_eps")
            and not self.causality
            and not self.return_att
            and rng is None
            and queries.shape == keys.shape
        ):
            from structured_alignment_vqa_tpu.ops.ring_attention import (
                ring_graph_attention,
            )
            from structured_alignment_vqa_tpu.parallel.context import current_mesh
            from structured_alignment_vqa_tpu.parallel.mesh import DATA_AXIS

            mesh = current_mesh()
            n_seq = mesh.shape.get(self.ring_axis, 1) if mesh is not None else 1
            if n_seq > 1:
                if queries.shape[1] % n_seq:
                    import warnings

                    warnings.warn(
                        f"ring attention skipped: L={queries.shape[1]} not "
                        f"divisible by {self.ring_axis}={n_seq}; falling back "
                        "to the single-device kernel (pick bucket maxlens "
                        "divisible by the seq axis)",
                        stacklevel=2,
                    )
                else:
                    if self.seq_impl == "ulysses":
                        from structured_alignment_vqa_tpu.ops.ulysses_attention import (
                            ulysses_graph_attention as seq_attention,
                        )
                    else:
                        seq_attention = ring_graph_attention
                    out = seq_attention(
                        q, k, v, content_mask(keys), content_mask(queries),
                        graph, self.num_heads, renorm,
                        mesh=mesh, seq_axis=self.ring_axis,
                        batch_axis=DATA_AXIS,
                    )
                    return self._finish(out, queries)

        # Fused Pallas path: self-attention-shaped graph attention with no
        # dropout and no attention-weights output (the hot encoder blocks).
        if (
            self.use_pallas
            and graph is not None
            and renorm in ("l1", "sum_eps")
            and not self.causality
            and not self.return_att
            and rng is None
            and queries.shape == keys.shape
        ):
            if queries.shape[1] > 512:
                # long-sequence regime: the full (L, L) tile exceeds VMEM;
                # use the K-blocked online-softmax kernel
                from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
                    flash_graph_attention,
                )

                out = flash_graph_attention(
                    q, k, v, content_mask(keys), content_mask(queries),
                    graph, self.num_heads, renorm,
                )
                return self._finish(out, queries)

            from structured_alignment_vqa_tpu.ops.pallas_attention import (
                fused_graph_attention_ln,
            )

            gamma, beta = self._ln_params()
            return fused_graph_attention_ln(
                q, k, v,
                content_mask(keys), content_mask(queries),
                graph, queries, gamma, beta, self.num_heads, renorm,
            )

        out, att = attention_core(
            q,
            k,
            v,
            key_mask=content_mask(keys),
            query_mask=content_mask(queries),
            num_heads=self.num_heads,
            graph=graph,
            renorm=renorm,
            causal=self.causality,
            dropout_rate=self.dropout_rate,
            dropout_rng=rng,
            deterministic=deterministic,
        )
        out = self._finish(out, queries)
        if self.return_att:
            return out, att
        return out


class MultiHeadAttention(_AttentionBase):
    """Vanilla MHA (`modules.py:119-207`) — decoder self-attention path."""

    @nn.compact
    def __call__(self, queries, keys, values, deterministic: bool = True):
        return self._run(queries, keys, values, graph=None, renorm=None, deterministic=deterministic)


class GraphGuidedAttention(_AttentionBase):
    """Graph-guided MHA: softmax -> x graph -> L1 renorm (`modules.py:210-311`)."""

    @nn.compact
    def __call__(self, queries, keys, values, graph, deterministic: bool = True):
        return self._run(queries, keys, values, graph=graph, renorm="l1", deterministic=deterministic)


class GraphMaskAttention(_AttentionBase):
    """Graph-mask MHA: softmax -> x graph -> sum+1e-7 renorm (`modules.py:314-403`).

    The reference signature takes a ``key_mask_ipt`` argument that its body
    never reads (the key mask is always content-derived, `modules.py:354`);
    we drop the dead argument. ``graph=None`` skips the multiply but keeps the
    sum renorm — the reference's ablation variants call this path
    (`transformers/AttModel_x.py:81` etc.) although its shipped body crashes
    on None (`modules.py:375`); this is the evident intended semantics.
    """

    @nn.compact
    def __call__(self, queries, keys, values, graph=None, deterministic: bool = True):
        return self._run(queries, keys, values, graph=graph, renorm="sum_eps", deterministic=deterministic)

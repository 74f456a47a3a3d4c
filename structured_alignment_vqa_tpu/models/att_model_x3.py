"""AttModelX3 — the flagship SA-VQA model, TPU-native.

Functional re-design of `/root/reference/models/AttModel_x3.py` (543 LoC):

* `VisualEncoder`   <- `AttModel_vis_grid` (`AttModel_x3.py:20-156`)
* `SymbolicEncoder` <- `AttModel_syb` (`AttModel_x3.py:158-282`)
* `MILNCEModule`    <- `MIL_NCE` (`AttModel_x3.py:285-443`)
* `AttModelX3`      <- `AttModel` (`AttModel_x3.py:471-542`)

Design departures (behavior-preserving, see SURVEY.md section 7):

* The reference builds per-sample block-diagonal masks and staged graphs with a
  Python loop over the batch (`AttModel_x3.py:110-122,236-247`);
  :func:`build_stage_graphs` does it with static-slice tensor writes, traced
  once under jit.
* The MIL relation branch materializes a (B, num_relations, O, O) bilinear
  tensor and then gathers a handful of entries, plus a Python loop over
  positive relations with sequential accumulation (`AttModel_x3.py:389-436`).
  We compute *only* the gathered bilinear entries (O(K·h^2) instead of
  O(R·O^2·h^2) FLOPs) and replace the loop with an order-independent
  scatter-add — additions commute, so the result is identical.
* The in-place aliasing of `graph_cross` by `graph` (`AttModel_x3.py:120-122`)
  is replicated by default (`ModelConfig.distinct_cross_stage=False`).

Parameters the reference defines but never uses in forward (`v_mlp`,
`input_proj`, `q_mlp`, `v_positional_encoding` — `AttModel_x3.py:46-54,65-67`)
are omitted; they contribute nothing to any output.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from structured_alignment_vqa_tpu.data.batch import VQABatch
from structured_alignment_vqa_tpu.models.config import ModelConfig
from structured_alignment_vqa_tpu.ops.attention import (
    GraphGuidedAttention,
    MultiHeadAttention,
)
from structured_alignment_vqa_tpu.ops.layers import Embedding, FeedForward
from structured_alignment_vqa_tpu.ops.mcb import compact_bilinear_pooling, count_sketch_matrix
from structured_alignment_vqa_tpu.ops.quant import QDense, quantized_lookup
from structured_alignment_vqa_tpu.ops.mil_nce import (
    compact_softmax_gather,
    mil_nce_obj_objective,
    mil_nce_rel_objective,
)

BOS_ID = 2  # decoder input token (`AttModel_x3.py:141,267`)


def build_stage_graphs(
    modality_mask: jax.Array,
    q_mask: jax.Array,
    q_graph: jax.Array,
    modality_graph: Optional[jax.Array],
    use_dec_mask: bool,
    distinct_cross_stage: bool = False,
    mod_seg: Optional[jax.Array] = None,
    q_seg: Optional[jax.Array] = None,
    n_pack: int = 1,
):
    """Vectorized staged-graph construction (`AttModel_x3.py:103-122,229-247`).

    Args:
      modality_mask: (B, Lm, Lm) validity square of the modality tokens.
      q_mask/q_graph: (B, Lq, Lq) question validity square / adjacency.
      modality_graph: (B, Lm, Lm) adjacency for the final stage's modality
        block — None means fully-connected (the visual branch).
      mod_seg/q_seg: optional (B, Lm)/(B, Lq) per-token pack-segment ids
        (-1 = padding). When given, every stage graph is multiplied by the
        segment-equality matrix, so packed sub-samples are exactly isolated:
        the L1 renorm after the graph multiply cancels the softmax normalizer,
        making attention invariant to zero-graph keys from other segments.
      n_pack: pack slots per row; the decoder gets one query row per slot.

    Returns:
      (graph_diag, graph_cross, graph, dec_mask) — all float32; dec_mask is
      (B, n_pack, Lm+Lq).
    """
    b, lm, _ = modality_mask.shape
    lq = q_mask.shape[1]
    size = lm + lq
    f32 = jnp.float32

    mask = jnp.zeros((b, size, size), f32)
    mask = mask.at[:, :lm, :lm].set(modality_mask.astype(f32))
    mask = mask.at[:, lm:, lm:].set(q_mask.astype(f32))

    # Stage 1: intra-modality graph — the reference only writes the question
    # block (`AttModel_x3.py:112`), leaving the modality block all-zero.
    graph_diag = jnp.zeros((b, size, size), f32).at[:, lm:, lm:].set(q_mask.astype(f32))

    # Stage 3 graph, built by mutating `1 - mask` in place.
    graph = 1.0 - mask
    if modality_graph is None:
        graph = graph.at[:, :lm, :lm].set(1.0)
    else:
        graph = graph.at[:, :lm, :lm].set(modality_graph.astype(f32))
    graph = graph.at[:, lm:, lm:].set(q_graph.astype(f32))

    # Stage 2: the reference's `graph_cross` aliases `graph` after the in-place
    # writes above, so by default they are the same tensor.
    graph_cross = (1.0 - mask) if distinct_cross_stage else graph

    seg = None
    if mod_seg is not None:
        seg = jnp.concatenate([mod_seg, q_seg], axis=1)          # (B, size)
        seg_eq = (
            (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] >= 0)
        ).astype(f32)
        graph_diag = graph_diag * seg_eq
        graph = graph * seg_eq
        graph_cross = graph if not distinct_cross_stage else graph_cross * seg_eq

    valid = (jnp.sum(mask, axis=2) > 0).astype(f32)              # (B, size)
    if not use_dec_mask:
        dec_mask = jnp.zeros((b, n_pack, size), f32)
    elif seg is None:
        dec_mask = jnp.broadcast_to(valid[:, None, :], (b, n_pack, size))
    else:
        slots = jnp.arange(n_pack)[None, :, None]                # (1, K, 1)
        dec_mask = (seg[:, None, :] == slots).astype(f32) * valid[:, None, :]
    return graph_diag, graph_cross, graph, dec_mask


class GloVeEmbed(nn.Module):
    """Trainable GloVe-initialized lookup (no zero row, no scaling).

    Mirrors ``nn.Embedding.from_pretrained(new_glove_voc, freeze=False)``
    (`AttModel_x3.py:41,171,314`). The actual GloVe vectors are grafted into
    the parameter post-init by `train/loop.py` (see `models/glove.py`).
    """

    vocab_size: int
    dim: int
    dtype: jnp.dtype = jnp.float32
    # int8 weight-only serving layout (`ops/quant.py`): int8 rows + per-row
    # scale, dequantized after the gather so only looked-up rows pay the
    # conversion and the table sits in HBM at a quarter the size.
    quantized: bool = False

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        if self.quantized:
            q = self.param(
                "table_q", nn.initializers.zeros, (self.vocab_size, self.dim), jnp.int8
            )
            s = self.param(
                "table_scale", nn.initializers.ones, (self.vocab_size,), jnp.float32
            )
            return quantized_lookup(q, s, ids, self.dtype)
        table = self.param(
            "table", nn.initializers.xavier_normal(), (self.vocab_size, self.dim), jnp.float32
        )
        return jnp.take(table, ids, axis=0).astype(self.dtype)


class _EncBlock(nn.Module):
    """One encoder block: graph-guided attention + FFN. Split out so
    ``ModelConfig.remat_blocks`` can wrap it in jax.checkpoint (recompute
    activations in backward — required headroom for the obj+rel maxlen-1600
    configuration)."""

    cfg: ModelConfig
    idx: int

    @nn.compact
    def __call__(self, fea, graph, deterministic: bool = True):
        cfg = self.cfg
        fea = GraphGuidedAttention(
            num_units=cfg.hidden_size, num_heads=cfg.num_heads,
            dropout_rate=0.0, dtype=cfg.compute_dtype,
            name=f"enc_self_attention_{self.idx}",
            use_pallas=cfg.use_pallas_attention,
            ring_axis=cfg.seq_axis,
            seq_impl=cfg.seq_impl,
        )(fea, fea, fea, graph, deterministic=deterministic)
        return FeedForward(
            cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
            dtype=cfg.compute_dtype, name=f"enc_feed_forward_{self.idx}",
            use_pallas=cfg.use_pallas_attention,
        )(fea)


class _EncoderDecoder(nn.Module):
    """Shared dual-branch encoder/decoder body.

    Three attention stages over (modality ++ question) tokens, then a 1-token
    decoder that cross-attends into the encoded sequence
    (`AttModel_x3.py:124-156,248-282`).
    """

    cfg: ModelConfig
    pe_table_size: int
    pe_dropout: bool  # the visual branch drops out its PE, the symbolic doesn't
    name_prefix: str = ""
    # x3 applies ReLU after the 300->2048 question projection
    # (`AttModel_x3.py:42-43`); the x2_dec fork's syb_mlp is a bare Linear
    # (`AttModel_x2_dec.py:38`) — variants toggle this off
    mlp_relu: bool = True
    # Decoder cross-attention flavor: 'graph' = graph-guided with the
    # dec_mask row (`AttModel_x3.py:150-156`); 'vanilla' = plain
    # content-masked multihead attention with NO mask argument — the
    # x2_mlp_dec fork swaps the module class and drops dec_mask
    # (`AttModel_x2_mlp_dec.py:227-231,324`)
    dec_cross: str = "graph"

    @nn.compact
    def __call__(
        self,
        modality_fea: jax.Array,      # (B, Lm, 2048)
        modality_mask: jax.Array,     # (B, Lm, Lm)
        modality_graph: Optional[jax.Array],  # (B, Lm, Lm) or None (visual)
        q_ids: jax.Array,             # (B, Lq)
        q_graph: jax.Array,           # (B, Lq, Lq)
        q_mask: jax.Array,            # (B, Lq, Lq)
        glove: nn.Module,
        deterministic: bool = True,
        mod_seg: Optional[jax.Array] = None,   # (B, Lm) pack-segment ids
        q_seg: Optional[jax.Array] = None,     # (B, Lq)
        mod_pos: Optional[jax.Array] = None,   # (B, Lm) PE positions
        q_pos: Optional[jax.Array] = None,     # (B, Lq) local PE positions
        n_pack: int = 1,
    ) -> jax.Array:
        cfg = self.cfg
        b, lm = modality_fea.shape[:2]
        dt = cfg.compute_dtype

        # Question path: GloVe embed -> Linear(300, 2048) + ReLU
        # (`AttModel_x3.py:96-97,216-217`).
        q_fea = nn.Dense(cfg.vis_fea_dim, dtype=dt, name="syb_mlp")(glove(q_ids))
        if self.mlp_relu:
            q_fea = jax.nn.relu(q_fea)

        fea = jnp.concatenate([modality_fea.astype(dt), q_fea], axis=1)
        fea = nn.Dense(cfg.hidden_size, dtype=dt, name="syb_mlp2")(fea)

        size = fea.shape[1]
        if mod_pos is None:
            pos_ids = jnp.broadcast_to(jnp.arange(size)[None, :], (b, size))
        else:
            # Packed rows use *tight-bucket* semantics: each sub-sample sees
            # exactly the PE ids it would see collated alone with zero padding
            # (modality tokens 0..n-1; its question tokens offset by its OWN
            # modality token count, not the row budget). The offset is the
            # per-segment modality population, computed from the segment ids.
            mod_count = jnp.sum(
                (mod_seg[:, None, :] == q_seg[:, :, None])
                & (mod_seg[:, None, :] >= 0),
                axis=-1,
            )                                                    # (B, Lq)
            pos_ids = jnp.concatenate([mod_pos, q_pos + mod_count], axis=1)
        pe = Embedding(
            self.pe_table_size, cfg.hidden_size, zeros_pad=False, scale=False,
            dtype=dt, name="syb_positional_encoding",
        )(pos_ids)
        if self.pe_dropout:
            pe = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(pe)
        fea = fea + pe
        fea = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(fea)

        graph_diag, graph_cross, graph, dec_mask = build_stage_graphs(
            modality_mask, q_mask, q_graph, modality_graph,
            use_dec_mask=cfg.use_dec_mask,
            distinct_cross_stage=cfg.distinct_cross_stage,
            mod_seg=mod_seg, q_seg=q_seg, n_pack=n_pack,
        )

        block_cls = (
            nn.remat(_EncBlock, static_argnums=(3,)) if cfg.remat_blocks else _EncBlock
        )
        for i in range(cfg.num_blocks):
            if i < cfg.stage1_blocks:
                g = graph_diag
            elif i < cfg.stage2_blocks:
                g = graph_cross
            else:
                g = graph
            fea = block_cls(cfg, i, name=f"block_{i}")(fea, g, deterministic)

        # 1-token-per-sample decoder, BOS id 2 (`AttModel_x3.py:141-156`).
        # Packed rows carry n_pack decoder tokens, one per pack slot. Each
        # token must behave exactly like the reference's single token, so
        # self-attention/FFN run at (B*K, 1, C) — per-token, hitting the exact
        # 1-token path — while cross-attention runs at (B, K, L) with the
        # per-slot dec_mask (the L1 renorm restricts it to the slot's segment).
        dec_ids = jnp.full((b, n_pack), BOS_ID, jnp.int32)
        dec = Embedding(
            cfg.num_classes, cfg.hidden_size, zeros_pad=True, scale=True,
            dtype=dt, name="dec_emb",
        )(dec_ids)
        dec = dec + Embedding(
            self.pe_table_size, cfg.hidden_size, zeros_pad=False, scale=False,
            dtype=dt, name="dec_positional_encoding",
        )(jnp.zeros((b, n_pack), jnp.int32))
        dec = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(dec)

        h = cfg.hidden_size
        for i in range(cfg.num_blocks):
            dec = MultiHeadAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads,
                dropout_rate=0.0, causality=True, dtype=dt,
                name=f"dec_self_attention_{i}",
            )(
                dec.reshape(b * n_pack, 1, h),
                dec.reshape(b * n_pack, 1, h),
                dec.reshape(b * n_pack, 1, h),
                deterministic=deterministic,
            ).reshape(b, n_pack, h)
            if self.dec_cross == "vanilla":
                assert n_pack == 1, "vanilla decoder cross-attn has no pack mask"
                dec = MultiHeadAttention(
                    num_units=cfg.hidden_size, num_heads=cfg.num_heads,
                    dropout_rate=0.0, dtype=dt, name=f"dec_vanilla_attention_{i}",
                )(dec, fea, fea, deterministic=deterministic)
            else:
                dec = GraphGuidedAttention(
                    num_units=cfg.hidden_size, num_heads=cfg.num_heads,
                    dropout_rate=0.0, dtype=dt, name=f"dec_vanilla_attention_{i}",
                )(dec, fea, fea, dec_mask, deterministic=deterministic)
            dec = FeedForward(
                cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                dtype=dt, name=f"dec_feed_forward_{i}",
            )(dec)
        return dec  # (B, n_pack, hidden)


class VisualEncoder(nn.Module):
    """Visual branch: region features ++ question nodes (`AttModel_x3.py:20-156`)."""

    cfg: ModelConfig
    glove: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, vis_fea, vis_mask, q_ids, q_graph, q_mask, deterministic=True,
                 mod_seg=None, q_seg=None, mod_pos=None, q_pos=None, n_pack=1):
        glove = self.glove or GloVeEmbed(
            self.cfg.vocab_size, self.cfg.glove_dim,
            dtype=self.cfg.compute_dtype, name="syb_emb",
            quantized=self.cfg.int8_serving,
        )
        return _EncoderDecoder(
            self.cfg, pe_table_size=self.cfg.maxlen, pe_dropout=True, name="body",
        )(vis_fea, vis_mask, None, q_ids, q_graph, q_mask, glove, deterministic,
          mod_seg=mod_seg, q_seg=q_seg, mod_pos=mod_pos, q_pos=q_pos, n_pack=n_pack)


class SymbolicEncoder(nn.Module):
    """Symbolic branch: MIL-rewritten macro nodes ++ question (`AttModel_x3.py:158-282`)."""

    cfg: ModelConfig
    glove: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, syb_fea, syb_mask, syb_graph, q_ids, q_graph, q_mask, deterministic=True,
                 mod_seg=None, q_seg=None, mod_pos=None, q_pos=None, n_pack=1):
        glove = self.glove or GloVeEmbed(
            self.cfg.vocab_size, self.cfg.glove_dim,
            dtype=self.cfg.compute_dtype, name="syb_emb",
            quantized=self.cfg.int8_serving,
        )
        return _EncoderDecoder(
            self.cfg, pe_table_size=self.cfg.maxlen + self.cfg.maxlen_q,
            pe_dropout=False, name="body",
        )(syb_fea, syb_mask, syb_graph, q_ids, q_graph, q_mask, glove, deterministic,
          mod_seg=mod_seg, q_seg=q_seg, mod_pos=mod_pos, q_pos=q_pos, n_pack=n_pack)


class MILNCEModule(nn.Module):
    """Structured alignment: MIL-NCE grounding + super-node rewrite
    (`AttModel_x3.py:285-443`)."""

    cfg: ModelConfig
    glove: Optional[nn.Module] = None

    @nn.compact
    def __call__(
        self,
        vis_fea: jax.Array,          # (B, O, 2048)
        macro_ipt: jax.Array,        # (B, Ls)
        macro_obj_loc: jax.Array,    # (B, O)
        micro_pos_obj: jax.Array,    # (B, O, topN)
        micro_neg_obj: jax.Array,    # (B, O, topN)
        micro_obj_mask: jax.Array,   # (B, O, topN)
        micro_pos_rel: jax.Array,    # (B, R)
        micro_neg_rel: jax.Array,    # (B, R)
        micro_pos_rel_loc: jax.Array,  # (B, R, 5)
        micro_neg_rel_loc: jax.Array,  # (B, R, 5)
    ):
        cfg = self.cfg
        h = cfg.hidden_size_mil
        dt = cfg.compute_dtype
        b, ls = macro_ipt.shape
        o = vis_fea.shape[1]

        glove = self.glove or GloVeEmbed(
            cfg.vocab_size, cfg.glove_dim, dtype=dt, name="syb_emb",
            quantized=cfg.int8_serving,
        )

        marco_mlp = nn.Dense(h, dtype=dt, name="marco_mlp")
        syb_mlp = nn.Dense(h, dtype=dt, name="syb_mlp")
        vis_mlp = nn.Dense(h, dtype=dt, name="vis_mlp")

        # Macro node embeddings, detached (`AttModel_x3.py:352-354`).
        macro_fea = jax.nn.relu(marco_mlp(glove(macro_ipt)))
        new_macro = jax.lax.stop_gradient(macro_fea)

        pos_fea = jax.nn.relu(syb_mlp(glove(micro_pos_obj)))   # (B, O, topN, h)
        neg_fea = jax.nn.relu(syb_mlp(glove(micro_neg_obj)))
        vis_emb = jax.nn.relu(vis_mlp(vis_fea.astype(dt)))     # (B, O, h)

        # Candidate-vs-region dot scores (`AttModel_x3.py:365-366`).
        pos_scores = jnp.einsum(
            "both,boh->bot", pos_fea, vis_emb, preferred_element_type=jnp.float32
        )
        neg_scores = jnp.einsum(
            "both,boh->bot", neg_fea, vis_emb, preferred_element_type=jnp.float32
        )
        obj_mask = micro_obj_mask.astype(jnp.float32)
        mil_obj = mil_nce_obj_objective(pos_scores * obj_mask, neg_scores * obj_mask)

        # Super-node rewrite: softmax over *unmasked* scores (`AttModel_x3.py:372-374`).
        w = jax.nn.softmax(pos_scores, axis=2).astype(pos_fea.dtype)
        new_obj_fea = jnp.sum(w[..., None] * pos_fea, axis=2)  # (B, O, h)

        batch_idx = jnp.arange(b)[:, None]
        safe_loc = jnp.where(macro_obj_loc >= 0, macro_obj_loc, ls)  # ls -> dropped
        new_macro = new_macro.at[batch_idx, safe_loc].set(
            new_obj_fea.astype(new_macro.dtype), mode="drop"
        )

        if cfg.only_obj:
            mil_rel = jnp.float32(0.0)
        else:
            new_macro, mil_rel = self._relation_branch(
                glove, syb_mlp, new_macro, new_obj_fea,
                micro_pos_rel, micro_pos_rel_loc, micro_neg_rel_loc,
            )

        out = jax.nn.relu(nn.Dense(cfg.vis_fea_dim, dtype=dt, name="ipt_mlp")(new_macro))
        return out, mil_obj, mil_rel

    def _relation_branch(
        self, glove, syb_mlp, new_macro, new_obj_fea,
        micro_pos_rel, micro_pos_rel_loc, micro_neg_rel_loc,
    ):
        """Relation MIL-NCE + super-node relation rewrite (`AttModel_x3.py:382-439`).

        The reference computes the full (B, num_relations, O, O) bilinear
        tensor x_i^T R_r x_j and gathers a few entries; we gather first and
        contract per entry — identical values, a tiny fraction of the FLOPs.
        """
        cfg = self.cfg
        h = cfg.hidden_size_mil
        b, k = micro_pos_rel.shape
        ls = new_macro.shape[1]

        R = self.param(
            "R", nn.initializers.xavier_normal(), (cfg.num_relations, h, h), jnp.float32
        )

        rel_fea = jax.nn.relu(syb_mlp(glove(micro_pos_rel)))  # (B, K, h)

        n_obj = new_obj_fea.shape[1]

        def gathered_bilinear(loc):
            # loc: (B, K, 5) = [obj_i, obj_j, rel_cat, macro_loc, micro_loc]
            obj_i = jnp.clip(loc[..., 0], 0, n_obj - 1)
            obj_j = jnp.clip(loc[..., 1], 0, n_obj - 1)
            cat = jnp.clip(loc[..., 2], 0, cfg.num_relations - 1)
            bi = jnp.arange(b)[:, None]
            xi = new_obj_fea[bi, obj_i].astype(jnp.float32)   # (B, K, h)
            xj = new_obj_fea[bi, obj_j].astype(jnp.float32)   # (B, K, h)
            Rk = R[cat]                                        # (B, K, h, h)
            return jnp.einsum("bkh,bkhg,bkg->bk", xi, Rk, xj)

        pos_valid = micro_pos_rel_loc[..., 3] >= 0
        neg_valid = micro_neg_rel_loc[..., 3] >= 0
        pos_scores = gathered_bilinear(micro_pos_rel_loc)
        neg_scores = gathered_bilinear(micro_neg_rel_loc)

        mil_rel = mil_nce_rel_objective(
            pos_scores.reshape(-1), pos_valid.reshape(-1),
            neg_scores.reshape(-1), neg_valid.reshape(-1),
        )

        # Zero every positive-relation macro row, then scatter-add the
        # softmax-weighted relation embeddings (`AttModel_x3.py:417-436`).
        macro_loc = micro_pos_rel_loc[..., 3]
        micro_loc = micro_pos_rel_loc[..., 4]
        safe_loc = jnp.where(pos_valid, macro_loc, ls)
        bi = jnp.arange(b)[:, None]

        row_zero = jnp.zeros((b, ls), new_macro.dtype).at[bi, safe_loc].set(1.0, mode="drop")
        new_macro = new_macro * (1.0 - row_zero[..., None])

        weights = compact_softmax_gather(
            pos_scores.reshape(-1), pos_valid.reshape(-1),
            jnp.where(pos_valid, micro_loc, -1).reshape(-1),
        ).reshape(b, k)
        contrib = weights[..., None].astype(new_macro.dtype) * rel_fea[bi, jnp.clip(micro_loc, 0, k - 1)]
        contrib = jnp.where(pos_valid[..., None], contrib, 0.0)
        new_macro = new_macro.at[bi, safe_loc].add(contrib, mode="drop")
        return new_macro, mil_rel


class AttModelX3(nn.Module):
    """Top-level SA-VQA model (`AttModel_x3.py:471-542`).

    Returns ``(logits_concat, logits_vis, logits_syb, mil_nce_obj, mil_nce_rel)``.
    """

    cfg: ModelConfig
    # Seed for the frozen MCB count-sketch matrices (the reference draws them
    # from the torch global RNG at module init, `AttModel_x3.py:454-459`).
    mcb_sketch_seed: int = 12345

    def _head(self, prefix: str, x, deterministic):
        """Linear -> ReLU -> Dropout -> Linear classifier (`AttModel_x3.py:482-508`)."""
        cfg = self.cfg
        dense = QDense if cfg.int8_serving else nn.Dense
        x = jax.nn.relu(dense(cfg.hidden_size, dtype=cfg.compute_dtype, name=f"{prefix}_hidden")(x))
        x = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(x)
        return dense(cfg.num_classes, dtype=cfg.compute_dtype, name=f"{prefix}_out")(x)

    @nn.compact
    def __call__(self, batch: VQABatch, deterministic: bool = True):
        cfg = self.cfg
        cfg.validate()
        packed = batch.vis_seg is not None
        n_pack = batch.n_pack
        shared = (
            GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=cfg.compute_dtype,
                       name="glove", quantized=cfg.int8_serving)
            if cfg.share_glove else None
        )
        new_macro, mil_obj, mil_rel = MILNCEModule(cfg, glove=shared, name="mil_nce")(
            batch.vis_fea, batch.macro_ipt, batch.macro_obj_loc,
            batch.micro_pos_obj, batch.micro_neg_obj, batch.micro_obj_mask,
            batch.micro_pos_rel, batch.micro_neg_rel,
            batch.micro_pos_rel_loc, batch.micro_neg_rel_loc,
        )
        fea_vis = VisualEncoder(cfg, glove=shared, name="att_vis_grid")(
            batch.vis_fea, batch.vis_mask, batch.q_ipt, batch.q_graph, batch.q_mask,
            deterministic=deterministic,
            mod_seg=batch.vis_seg, q_seg=batch.q_seg,
            mod_pos=batch.vis_pos, q_pos=batch.q_pos, n_pack=n_pack,
        )
        fea_syb = SymbolicEncoder(cfg, glove=shared, name="att_syb")(
            new_macro, batch.macro_mask, batch.macro_graph,
            batch.q_ipt, batch.q_graph, batch.q_mask,
            deterministic=deterministic,
            mod_seg=batch.macro_seg, q_seg=batch.q_seg,
            mod_pos=batch.macro_pos, q_pos=batch.q_pos, n_pack=n_pack,
        )
        # Unpacked: logits (B, C). Packed: (B, K, C) — one row per pack slot,
        # aligned with the (B, K) answer/sample_valid layout.
        token = slice(None) if packed else 0
        logits_vis = self._head("cls_vis", fea_vis, deterministic)[:, token]
        logits_syb = self._head("cls_syb", fea_syb, deterministic)[:, token]

        if cfg.use_mcb:
            sketch_rng = np.random.default_rng(self.mcb_sketch_seed)
            s1 = self.variable(
                "constants", "sketch1",
                lambda: jnp.asarray(count_sketch_matrix(sketch_rng, cfg.hidden_size, cfg.mcb_out)),
            ).value
            s2 = self.variable(
                "constants", "sketch2",
                lambda: jnp.asarray(count_sketch_matrix(sketch_rng, cfg.hidden_size, cfg.mcb_out)),
            ).value
            fused = compact_bilinear_pooling(fea_syb, fea_vis, s1, s2, cfg.mcb_out)
            fused = nn.Dropout(cfg.dropout_rate_mcb, deterministic=deterministic)(fused)
            logits_concat = self._head("cls_mcb", fused, deterministic)[:, token]
        else:
            fused = jnp.concatenate([fea_syb[:, token], fea_vis[:, token]], axis=-1)
            logits_concat = self._head("cls", fused, deterministic)

        return logits_concat, logits_vis, logits_syb, mil_obj, mil_rel

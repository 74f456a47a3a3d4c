"""The ablation-model matrix: the reference's 17 `transformers/` file forks as
configuration over shared modules.

Family map (reference file -> class here; structural knobs in parentheses):

* `AttModel_x.py`            -> :class:`MaxPoolDualEncoder` (stage_style='x')
* `AttModel_x2.py`           -> :class:`MaxPoolDualEncoder` (stage_style='x2')
* `AttModel_x2_pre.py`       -> :class:`MaxPoolDualEncoder` (stage_style='x2';
  the fork is byte-identical to AttModel_x2.py)
* `AttModel_x2_distill.py`   -> :class:`MaxPoolDualEncoder`
  (stage_style='x2_distill': query-validity diag masks + constant cross)
* `AttModel.py`, `AttModel_sameMask.py` -> dead legacy (import a module that
  does not exist in the repo, SURVEY.md section 1); covered by stage_style='x'.
* `AttModel_x4_dec.py`       -> :class:`X4DecModel` (1-token decoder, 1-D masks)
* `AttModel_x2_dec.py`       -> :class:`X2DecModel` (heads='single',
                                mlp_relu=False; visGraph option)
* `AttModel_x2_mlp_dec.py`   -> :class:`X2DecModel` (heads='single',
                                vis_v_mlp=True, dec_cross='vanilla')
* `AttModel_x2_syb_dec.py`, `AttModel_x2_fusion_dec.py` (byte-identical forks)
                             -> :class:`X2DecModel` (heads='triple',
                                mlp_relu=False)
* `AttModel_x2_dec_ori.py`   -> :class:`X2DecOriModel` (graph-mask attention,
                                PE-less 1-token decoder, per-branch q_mlp)
* `AttModel_x2_fusion_dec_relatt.py` -> :class:`X2FusionDecRelatt` (region
  features substituted into the vis-symbolic node graph)
* `AttModel_x2_fusion_dec_mil.py`  -> :class:`X2FusionDecMil`
* `AttModel_x2_fusion_dec_mil2.py` -> :class:`X2FusionDecMil2`
* `AttModel_x3_ori.py`       -> :class:`X3OriModel` (the x3 body with maxlen
                                PE tables, no vis graph, and the batch-loop
                                MIL); the successor is `att_model_x3.AttModelX3`
* `AttModel_x5_dec_mil.py`   -> :class:`X5DecMil`
* `AttModel_x6_dec_mil.py`   -> :class:`X6DecMil`
* `AttModel_x7_dec_mil.py`   -> :class:`X7DecMil`

All use the graph-mask attention flavor (sum+1e-7 renorm) except the x2_dec/x3
line, which uses the L1-renorm graph-guided attention. The reference calls the
graph-mask op with ``graph=None`` in several places where its shipped body
would crash (`modules.py:375`); here None means "mask-only attention", the
evident intent.

These models return raw logits (plus attention weights for the MIL line, fed
to :class:`~structured_alignment_vqa_tpu.train.att_mil_loss.AttMILLoss`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from structured_alignment_vqa_tpu.models.att_model_x3 import (
    BOS_ID,
    GloVeEmbed,
    _EncoderDecoder,
    build_stage_graphs,
)
from structured_alignment_vqa_tpu.models.config import ModelConfig
from structured_alignment_vqa_tpu.ops.attention import (
    GraphGuidedAttention,
    GraphMaskAttention,
)
from structured_alignment_vqa_tpu.ops.layers import Embedding, FeedForward


def _positions(b: int, l: int) -> jax.Array:
    return jnp.broadcast_to(jnp.arange(l)[None, :], (b, l))


class _TwoLayerMLP(nn.Module):
    """Linear -> ReLU -> Linear (the reference's v_mlp / q_mlp shape).

    ``relu=False`` drops the activation: the x2_dec line's syb_mlp is two
    bare Linears — the fork comments the ReLU out (`AttModel_x2_dec.py:374-376`,
    `AttModel_x2_syb_dec.py:34-39`)."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        if self.relu:
            x = jax.nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


def _stage_graphs_1d(mod_mask, q_mask, q_graph, mod_graph, style: str,
                     visual: bool = True):
    """Stage graphs from 1-D masks, the x/x2/x2_distill constructions.

    mod_mask/q_mask: (B, Lm)/(B, Lq) 0/1; q_graph: (B, Lq, Lq);
    mod_graph: (B, Lm, Lm) or None (visual branch: fully connected).

    x  (`AttModel_x.py:84-91`): stage1 = None (mask-only), stage2 = zeros
       with [mod_graph|q_graph] diagonal blocks.

    x2 (`AttModel_x2.py:94-117,212-238`) masks diagonal/cross blocks by KEY
       validity (``mask.unsqueeze(1)`` — every row carries the key mask);
       x2_distill (`AttModel_x2_distill.py:75-83,159-173`) masks the diagonal
       blocks by QUERY validity (``unsqueeze(2)``) and uses constant-1 cross
       blocks. The visual branch's own mask is all-ones in both (grid
       features), so its diag mod block is the constant the reference writes.
       Both: graph = ones with mod_graph (symbolic only) and q_graph set.
    """
    b, lm = mod_mask.shape
    lq = q_mask.shape[1]
    size = lm + lq
    f32 = jnp.float32
    qm = q_mask.astype(f32)
    mm = mod_mask.astype(f32)

    if style == "x":
        graph = jnp.zeros((b, size, size), f32)
        final = graph
        if mod_graph is not None:
            final = final.at[:, :lm, :lm].set(mod_graph.astype(f32))
        final = final.at[:, lm:, lm:].set(q_graph.astype(f32))
        return [None, final]

    if style == "x2":
        # key-validity masks: block[:, i, j] = mask[j]
        q_blk = jnp.broadcast_to(qm[:, None, :], (b, lq, lq))
        m_blk = (jnp.ones((b, lm, lm), f32) if visual
                 else jnp.broadcast_to(mm[:, None, :], (b, lm, lm)))
        cross_mq = jnp.broadcast_to(qm[:, None, :], (b, lm, lq))
        cross_qm = (jnp.ones((b, lq, lm), f32) if visual
                    else jnp.broadcast_to(mm[:, None, :], (b, lq, lm)))
    else:  # x2_distill: query-validity diag, constant-1 cross
        q_blk = jnp.broadcast_to(qm[:, :, None], (b, lq, lq))
        m_blk = (jnp.ones((b, lm, lm), f32) if visual
                 else jnp.broadcast_to(mm[:, :, None], (b, lm, lm)))
        cross_mq = jnp.ones((b, lm, lq), f32)
        cross_qm = jnp.ones((b, lq, lm), f32)

    graph_diag = jnp.zeros((b, size, size), f32)
    graph_diag = graph_diag.at[:, :lm, :lm].set(m_blk)
    graph_diag = graph_diag.at[:, lm:, lm:].set(q_blk)
    graph_cross = jnp.zeros((b, size, size), f32)
    graph_cross = graph_cross.at[:, :lm, lm:].set(cross_mq)
    graph_cross = graph_cross.at[:, lm:, :lm].set(cross_qm)
    graph_full = jnp.ones((b, size, size), f32)
    if mod_graph is not None:
        graph_full = graph_full.at[:, :lm, :lm].set(mod_graph.astype(f32))
    graph_full = graph_full.at[:, lm:, lm:].set(q_graph.astype(f32))
    return [graph_diag, graph_cross, graph_full]


class _MaxPoolBranch(nn.Module):
    """One encoder branch of the x/x2/x2_distill family: modality ++ question
    tokens, graph-staged blocks, max-pool (`AttModel_x.py:62-95,143-179`;
    `AttModel_x2.py:73-131,190-255`; `AttModel_x2_distill.py:54-101,137-186`).

    Two reference quirks are preserved exactly:

    * the SYMBOLIC branch's final (full-graph) stage re-runs blocks
      ``0 .. num_blocks//2`` instead of advancing to blocks 4.. — blocks 4/5
      exist but are never called (`AttModel_x2.py:238-240`,
      `AttModel_x2_distill.py:180-182`); the visual branch advances normally
      (`AttModel_x2.py:115-117`);
    * x2's symbolic branch max-pools the UNMASKED features — its
      ``fea = fea_graph * mask`` line is dead, ``torch.max`` reads
      ``fea_graph`` (`AttModel_x2.py:242-255`); the visual branch and both
      x2_distill branches pool the masked features.
    """

    cfg: ModelConfig
    stage_style: str  # 'x' | 'x2' | 'x2_distill'
    is_visual: bool
    pe_size: int

    @nn.compact
    def __call__(self, mod_fea, mod_mask, mod_graph, q_fea, q_graph, q_mask,
                 deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, lm = mod_fea.shape[:2]
        lq = q_fea.shape[1]

        q = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name="q_mlp")(q_fea)
        q = q + nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(
            Embedding(cfg.maxlen_q, cfg.hidden_size, zeros_pad=False, scale=False,
                      dtype=dt, name="q_positional_encoding")(_positions(b, lq))
        )
        m = mod_fea.astype(dt)
        m = m + nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(
            Embedding(self.pe_size, cfg.hidden_size, zeros_pad=False, scale=False,
                      dtype=dt, name="positional_encoding")(_positions(b, lm))
        )
        fea = jnp.concatenate([m, q], axis=1)
        mask_1d = jnp.concatenate(
            [mod_mask.astype(jnp.float32), q_mask.astype(jnp.float32)], axis=1
        )

        stages = _stage_graphs_1d(
            mod_mask, q_mask, q_graph, mod_graph, self.stage_style,
            visual=self.is_visual,
        )
        n = cfg.num_blocks
        if self.stage_style == "x":
            plan = list(enumerate([stages[0]] * (n // 2) + [stages[1]] * (n - n // 2)))
        else:
            s1, s2 = cfg.stage1_blocks, cfg.stage2_blocks
            plan = ([(i, stages[0]) for i in range(s1)]
                    + [(i, stages[1]) for i in range(s1, s2)])
            if self.is_visual:
                plan += [(i, stages[2]) for i in range(s2, n)]
            else:  # symbolic final stage reuses the early blocks (see above)
                plan += [(i, stages[2]) for i in range(n // 2)]

        # instantiate per index; blocks outside the plan (symbolic 4/5) never
        # run — the reference constructs their torch params but never calls
        # them, so they are output-irrelevant and own no params here
        blocks = [
            (GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads,
                dropout_rate=0.0, dtype=dt, name=f"enc_self_attention_{i}"),
             FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                         dtype=dt, name=f"enc_feed_forward_{i}"))
            for i in range(n)
        ]
        for i, g in plan:
            att, ffn = blocks[i]
            fea = att(fea, fea, fea, g, deterministic=deterministic)
            fea = ffn(fea)

        masked = fea * mask_1d[..., None].astype(fea.dtype)
        pool_src = fea if (self.stage_style == "x2" and not self.is_visual) else masked
        return jnp.max(pool_src, axis=1)  # (B, h)


class MaxPoolDualEncoder(nn.Module):
    """x / x2 / x2_pre / x2_distill top: two max-pooled branches, concat, one
    classifier head (`AttModel_x.py:181-211`)."""

    cfg: ModelConfig
    stage_style: str = "x2"

    @nn.compact
    def __call__(self, vis_fea, q_ipt, q_mask_1d, q_graph, syb_ipt, syb_mask_1d,
                 syb_graph, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="q_emb")
        q_fea = glove(q_ipt)

        b, lv = vis_fea.shape[:2]
        vis_proj = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name="v_mlp")(
            vis_fea.astype(dt)
        )
        vis_mask_1d = jnp.ones((b, lv), jnp.float32)  # grid features: all valid
        fea_vis = _MaxPoolBranch(
            cfg, self.stage_style, True, pe_size=cfg.maxlen_v, name="att_vis_grid",
        )(vis_proj, vis_mask_1d, None, q_fea, q_graph, q_mask_1d, deterministic)

        syb_emb = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="syb_emb")
        syb_fea = _TwoLayerMLP(cfg.vis_fea_dim, cfg.hidden_size, dt, name="syb_mlp")(
            syb_emb(syb_ipt)
        )
        fea_syb = _MaxPoolBranch(
            cfg, self.stage_style, False, pe_size=cfg.maxlen, name="att_syb",
        )(syb_fea, syb_mask_1d, syb_graph, q_fea, q_graph, q_mask_1d, deterministic)

        fea = jnp.concatenate([fea_syb, fea_vis], axis=1)
        h = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name="cls_hidden")(fea))
        h = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(h)
        return nn.Dense(cfg.num_classes, dtype=dt, name="cls_out")(h)


class X2DecModel(nn.Module):
    """x2_dec line: AttModelX3's dual encoder/decoder body *without* MIL-NCE —
    the symbolic branch embeds token ids directly (`AttModel_x2_dec.py:272-277`)
    — plus the visGraph option (vis block adjacency from input,
    `AttModel_x2_dec.py:144-148`). ``heads='single'`` (x2_dec) or ``'triple'``
    (x2_fusion_dec / x3_ori, `AttModel_x2_fusion_dec.py:400-420`).
    """

    cfg: ModelConfig
    heads: str = "single"  # 'single' | 'triple'
    # The whole x2_dec/x2_syb_dec/x2_fusion_dec line uses a BARE Linear
    # syb_mlp in both branches (`AttModel_x2_dec.py:38,199-201`,
    # `AttModel_x2_fusion_dec.py:38,196-198` — the ReLU'd Sequential is
    # commented out in every one of those forks); only x2_mlp_dec re-enables
    # the ReLU via its syb_mlp_sequence (`AttModel_x2_mlp_dec.py:35-38,272`)
    mlp_relu: bool = True
    # x2_mlp_dec only: live v_mlp Linear(2048,2048)+ReLU on the region
    # features before the concat (`AttModel_x2_mlp_dec.py:42-43,107`)
    vis_v_mlp: bool = False
    # x2_mlp_dec only: decoder cross-attention is plain content-masked
    # multihead with no dec_mask (`AttModel_x2_mlp_dec.py:227-231,324`)
    dec_cross: str = "graph"

    @nn.compact
    def __call__(self, vis_fea, vis_mask, q_ipt, q_mask, q_graph, syb_ipt,
                 syb_mask, syb_graph, vis_graph=None, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        shared = (
            GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="glove")
            if cfg.share_glove else None
        )

        vis_glove = shared or GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt,
                                         name="vis_syb_emb")
        if self.vis_v_mlp:
            vis_fea = jax.nn.relu(
                nn.Dense(cfg.vis_fea_dim, dtype=dt, name="v_mlp")(vis_fea.astype(dt)))
        fea_vis = _EncoderDecoder(
            cfg, pe_table_size=cfg.maxlen, pe_dropout=True, name="att_vis_grid",
            mlp_relu=self.mlp_relu, dec_cross=self.dec_cross,
        )(vis_fea, vis_mask, vis_graph, q_ipt, q_graph, q_mask, vis_glove,
          deterministic)

        # symbolic branch: embed [syb ids ++ q ids] jointly, 300 -> hidden
        syb_glove = shared or GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt,
                                         name="syb_syb_emb")
        b, ls = syb_ipt.shape
        lq = q_ipt.shape[1]
        joint = jnp.concatenate([syb_ipt, q_ipt], axis=1)
        fea = _TwoLayerMLP(cfg.vis_fea_dim, cfg.hidden_size, dt,
                           relu=self.mlp_relu, name="syb_mlp")(
            syb_glove(joint)
        )
        fea = fea + Embedding(
            cfg.maxlen + cfg.maxlen_q, cfg.hidden_size, zeros_pad=False, scale=False,
            dtype=dt, name="syb_positional_encoding",
        )(_positions(b, ls + lq))
        fea = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(fea)

        graph_diag, graph_cross, graph, dec_mask = build_stage_graphs(
            syb_mask, q_mask, q_graph, syb_graph,
            use_dec_mask=cfg.use_dec_mask,
            distinct_cross_stage=cfg.distinct_cross_stage,
        )
        for i in range(cfg.num_blocks):
            g = graph_diag if i < cfg.stage1_blocks else (
                graph_cross if i < cfg.stage2_blocks else graph)
            fea = GraphGuidedAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dropout_rate=0.0,
                dtype=dt, name=f"syb_enc_self_attention_{i}",
                use_pallas=cfg.use_pallas_attention,
            )(fea, fea, fea, g, deterministic=deterministic)
            fea = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"syb_enc_feed_forward_{i}")(fea)

        dec = Embedding(cfg.num_classes, cfg.hidden_size, zeros_pad=True, scale=True,
                        dtype=dt, name="syb_dec_emb")(jnp.full((b, 1), BOS_ID, jnp.int32))
        dec = dec + Embedding(
            cfg.maxlen + cfg.maxlen_q, cfg.hidden_size, zeros_pad=False, scale=False,
            dtype=dt, name="syb_dec_positional_encoding",
        )(jnp.zeros((b, 1), jnp.int32))
        dec = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(dec)
        from structured_alignment_vqa_tpu.ops.attention import MultiHeadAttention

        for i in range(cfg.num_blocks):
            dec = MultiHeadAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, causality=True,
                dtype=dt, name=f"syb_dec_self_attention_{i}",
            )(dec, dec, dec, deterministic=deterministic)
            if self.dec_cross == "vanilla":
                dec = MultiHeadAttention(
                    num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                    name=f"syb_dec_vanilla_attention_{i}",
                )(dec, fea, fea, deterministic=deterministic)
            else:
                dec = GraphGuidedAttention(
                    num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                    name=f"syb_dec_vanilla_attention_{i}",
                )(dec, fea, fea, dec_mask, deterministic=deterministic)
            dec = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"syb_dec_feed_forward_{i}")(dec)
        fea_syb = dec

        def head(prefix, x):
            x = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name=f"{prefix}_hidden")(x))
            x = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(x)
            return nn.Dense(cfg.num_classes, dtype=dt, name=f"{prefix}_out")(x)

        if self.heads == "triple":
            logits_vis = head("cls_vis", fea_vis)[:, 0]
            logits_syb = head("cls_syb", fea_syb)[:, 0]
            fused = jnp.concatenate([fea_syb[:, 0], fea_vis[:, 0]], axis=1)
            logits_concat = head("cls", fused)
            return logits_concat, logits_vis, logits_syb
        fused = jnp.concatenate([fea_syb[:, 0], fea_vis[:, 0]], axis=1)
        return head("cls", fused)


class _X2DecOriBranch(nn.Module):
    """One x2_dec_ori branch: x2-style staged GraphMaskAttention encoder (no
    block reuse) + a PE-less 1-token decoder of graph-mask cross-attention
    blocks — no decoder self-attention, BOS index 1
    (`AttModel_x2_dec_ori.py:80-132,186-244`).

    Quirks preserved: the cross stage's q->modality block is constant 1 in the
    VISUAL branch but mask-rows in the symbolic one (`:105-108` vs `:226`);
    the symbolic branch's post-encoder mask multiply is dead — its decoder
    attends the UNMASKED ``fea_graph`` (`:234-243`), while the visual branch
    reassigns and attends the masked one (`:121-130`).
    """

    cfg: ModelConfig
    is_visual: bool
    pe_size: int

    @nn.compact
    def __call__(self, mod_fea, mod_mask, mod_graph, q_fea, q_graph, q_mask,
                 deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, lm = mod_fea.shape[:2]
        lq = q_fea.shape[1]

        q = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name="q_mlp")(q_fea)
        q = q + nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(
            Embedding(cfg.maxlen_q, cfg.hidden_size, zeros_pad=False, scale=False,
                      dtype=dt, name="q_positional_encoding")(_positions(b, lq)))
        m = mod_fea.astype(dt)
        m = m + nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(
            Embedding(self.pe_size, cfg.hidden_size, zeros_pad=False, scale=False,
                      dtype=dt, name="positional_encoding")(_positions(b, lm)))
        fea = jnp.concatenate([m, q], axis=1)
        mask_1d = jnp.concatenate(
            [mod_mask.astype(jnp.float32), q_mask.astype(jnp.float32)], axis=1)

        f32 = jnp.float32
        size = lm + lq
        mm = mod_mask.astype(f32)
        qm = q_mask.astype(f32)
        graph_diag = jnp.zeros((b, size, size), f32)
        graph_diag = graph_diag.at[:, :lm, :lm].set(
            jnp.broadcast_to(mm[:, None, :], (b, lm, lm)))
        graph_diag = graph_diag.at[:, lm:, lm:].set(
            jnp.broadcast_to(qm[:, None, :], (b, lq, lq)))
        graph_cross = jnp.zeros((b, size, size), f32)
        graph_cross = graph_cross.at[:, :lm, lm:].set(
            jnp.broadcast_to(qm[:, None, :], (b, lm, lq)))
        graph_cross = graph_cross.at[:, lm:, :lm].set(
            jnp.ones((b, lq, lm), f32) if self.is_visual
            else jnp.broadcast_to(mm[:, None, :], (b, lq, lm)))
        graph_full = jnp.ones((b, size, size), f32)
        if mod_graph is not None:
            graph_full = graph_full.at[:, :lm, :lm].set(mod_graph.astype(f32))
        graph_full = graph_full.at[:, lm:, lm:].set(q_graph.astype(f32))

        s1, s2 = cfg.stage1_blocks, cfg.stage2_blocks
        for i in range(cfg.num_blocks):
            g = graph_diag if i < s1 else (graph_cross if i < s2 else graph_full)
            fea = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"enc_self_attention_{i}",
            )(fea, fea, fea, g, deterministic=deterministic)
            fea = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"enc_feed_forward_{i}")(fea)

        if self.is_visual:
            fea = fea * mask_1d[..., None].astype(fea.dtype)
        # decoder: BOS index 1 of a 2-row table, no PE, no self-attention
        dec = Embedding(2, cfg.hidden_size, zeros_pad=True, scale=True, dtype=dt,
                        name="dec_emb")(jnp.ones((b, 1), jnp.int32))
        for i in range(cfg.num_blocks):
            dec = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"dec_vanilla_attention_{i}",
            )(dec, fea, fea, None, deterministic=deterministic)
            dec = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"dec_feed_forward_{i}")(dec)
        return dec[:, 0]


class X2DecOriModel(nn.Module):
    """x2_dec_ori top: two decoder branches, concat, one classifier head
    (`AttModel_x2_dec_ori.py:246-277`). Distinct from the x2_dec line the
    registry previously collapsed it into: graph-MASK (sum+1e-7) attention
    everywhere, per-branch q_mlp on a shared q_emb, and the PE-less 1-token
    decoder."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, vis_mask_1d, q_ipt, q_mask_1d, q_graph,
                 syb_ipt, syb_mask_1d, syb_graph, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype

        def as_1d(mask):  # accept the dec-family square-mask batch format too
            return (jnp.sum(mask, 2) > 0).astype(jnp.float32) if mask.ndim == 3 else mask

        vis_mask_1d, q_mask_1d, syb_mask_1d = map(
            as_1d, (vis_mask_1d, q_mask_1d, syb_mask_1d))
        glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="q_emb")
        q_fea = glove(q_ipt)

        vis_proj = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name="v_mlp")(
            vis_fea.astype(dt))
        fea_vis = _X2DecOriBranch(cfg, True, pe_size=cfg.maxlen_v, name="att_vis_grid")(
            vis_proj, vis_mask_1d, None, q_fea, q_graph, q_mask_1d, deterministic)

        syb_emb = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="syb_emb")
        syb_fea = _TwoLayerMLP(cfg.vis_fea_dim, cfg.hidden_size, dt, name="syb_mlp")(
            syb_emb(syb_ipt))
        fea_syb = _X2DecOriBranch(cfg, False, pe_size=cfg.maxlen, name="att_syb")(
            syb_fea, syb_mask_1d, syb_graph, q_fea, q_graph, q_mask_1d, deterministic)

        fea = jnp.concatenate([fea_syb, fea_vis], axis=1)
        h = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name="cls_hidden")(fea))
        h = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(h)
        return nn.Dense(cfg.num_classes, dtype=dt, name="cls_out")(h)


class X4DecModel(nn.Module):
    """x4_dec: "from v2_dec, just change the diag" — the x2_dec_ori
    architecture with stage 1 running MASK-ONLY (graph=None) instead of
    diagonal-block masks (`AttModel_x4_dec.py:95-103,203-206`). Same PE-less
    1-token decoder (2-row BOS table), same asymmetric quirk: the visual
    branch's decoder attends the masked encoder output, the symbolic one the
    unmasked (`:118-128` vs `:225-233`). Cross-stage q->modality blocks carry
    the modality key mask in BOTH branches (`:101-104,207-210`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, vis_mask_1d, q_ipt, q_mask_1d, q_graph,
                 syb_ipt, syb_mask_1d, syb_graph, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="q_emb")
        q_fea = glove(q_ipt)

        def branch(name, mod_fea, mod_mask, mod_graph, pe_size, mask_decoder_src):
            b, lm = mod_fea.shape[:2]
            lq = q_fea.shape[1]
            q = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name=f"{name}_q_mlp")(q_fea)
            q = q + nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(
                Embedding(cfg.maxlen_q, cfg.hidden_size, zeros_pad=False, scale=False,
                          dtype=dt, name=f"{name}_q_positional_encoding")(_positions(b, lq)))
            m = mod_fea.astype(dt) + nn.Dropout(
                cfg.dropout_rate, deterministic=deterministic)(
                Embedding(pe_size, cfg.hidden_size, zeros_pad=False, scale=False,
                          dtype=dt, name=f"{name}_positional_encoding")(_positions(b, lm)))
            fea = jnp.concatenate([m, q], axis=1)
            mask_1d = jnp.concatenate(
                [mod_mask.astype(jnp.float32), q_mask_1d.astype(jnp.float32)], axis=1)
            # visual=False: the cross q->mod block carries the modality key
            # mask in x4's visual branch too (`AttModel_x4_dec.py:104`)
            stages = _stage_graphs_1d(mod_mask, q_mask_1d, q_graph, mod_graph,
                                      "x2", visual=False)
            plan = ([None] * cfg.stage1_blocks
                    + [stages[1]] * (cfg.stage2_blocks - cfg.stage1_blocks)
                    + [stages[2]] * (cfg.num_blocks - cfg.stage2_blocks))
            for i, g in enumerate(plan):
                fea = GraphMaskAttention(
                    num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                    name=f"{name}_enc_self_attention_{i}",
                )(fea, fea, fea, g, deterministic=deterministic)
                fea = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                                  dtype=dt, name=f"{name}_enc_feed_forward_{i}")(fea)
            if mask_decoder_src:
                fea = fea * mask_1d[..., None].astype(fea.dtype)
            # BOS index 1 of a 2-row table, no decoder PE (`:57,121-128`)
            dec = Embedding(2, cfg.hidden_size, scale=True, dtype=dt,
                            name=f"{name}_dec_emb")(jnp.ones((b, 1), jnp.int32))
            for i in range(cfg.num_blocks):
                dec = GraphMaskAttention(
                    num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                    name=f"{name}_dec_vanilla_attention_{i}",
                )(dec, fea, fea, None, deterministic=deterministic)
                dec = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                                  dtype=dt, name=f"{name}_dec_feed_forward_{i}")(dec)
            return dec[:, 0]

        b, lv = vis_fea.shape[:2]
        vis_proj = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name="v_mlp")(
            vis_fea.astype(dt))
        fea_vis = branch("vis", vis_proj, vis_mask_1d, None, cfg.maxlen_v, True)

        syb_emb = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="syb_emb")
        syb_fea = _TwoLayerMLP(cfg.vis_fea_dim, cfg.hidden_size, dt, name="syb_mlp")(
            syb_emb(syb_ipt))
        fea_syb = branch("syb", syb_fea, syb_mask_1d, syb_graph, cfg.maxlen, False)

        fea = jnp.concatenate([fea_syb, fea_vis], axis=1)
        h = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name="cls_hidden")(fea))
        h = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(h)
        return nn.Dense(cfg.num_classes, dtype=dt, name="cls_out")(h)


class _SelfStack(nn.Module):
    """Per-modality mask-only self-attention stack (`AttModel_x5_dec_mil.py:16-116`)."""

    cfg: ModelConfig
    n_blocks: int

    @nn.compact
    def __call__(self, fea, graph=None, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        for i in range(self.n_blocks):
            fea = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"enc_self_attention_{i}",
            )(fea, fea, fea, graph, deterministic=deterministic)
            fea = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"enc_feed_forward_{i}")(fea)
        return fea


class _MILAlignJoint(nn.Module):
    """x5 alignment: joint [vis ++ syb] stack returning per-block attention
    weights for the margin-rank MIL loss (`AttModel_x5_dec_mil.py:118-149`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, syb_fea, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        fea = jnp.concatenate([vis_fea, syb_fea], axis=1)
        att_weights = []
        for i in range(cfg.num_blocks):
            fea, att = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                return_att=True, name=f"enc_self_attention_{i}",
            )(fea, fea, fea, None, deterministic=deterministic)
            fea = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"enc_feed_forward_{i}")(fea)
            att_weights.append(att)
        return fea, att_weights


class _VisFeaPath(nn.Module):
    """v_mlp + PE for the raw 2048-d region features (`x5:30-54`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, lv = vis_fea.shape[:2]
        v = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name="v_mlp")(
            vis_fea.astype(dt))
        v = v + nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(
            Embedding(cfg.maxlen_v, cfg.hidden_size, zeros_pad=False, scale=False,
                      dtype=dt, name="v_positional_encoding")(_positions(b, lv)))
        return v


class _SybFeaPath(nn.Module):
    """syb_emb + 300->2048->h MLP + PE (`x5:68-116`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, syb_ipt, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, ls = syb_ipt.shape
        emb = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="syb_emb")
        s = _TwoLayerMLP(cfg.vis_fea_dim, cfg.hidden_size, dt, name="syb_mlp")(emb(syb_ipt))
        s = s + nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(
            Embedding(cfg.maxlen, cfg.hidden_size, zeros_pad=False, scale=False,
                      dtype=dt, name="syb_positional_encoding")(_positions(b, ls)))
        return s


class X5DecMil(nn.Module):
    """x5: self stacks -> joint MIL alignment -> question-token decoder over
    the fused sequence, masked max-pool, single head
    (`AttModel_x5_dec_mil.py:151-219`). Returns (logits, att_weights)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, vis_mask_1d, q_ipt, q_mask_1d, q_graph,
                 syb_ipt, syb_mask_1d, syb_graph, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b = vis_fea.shape[0]
        lq = q_ipt.shape[1]

        v = _VisFeaPath(cfg, name="att_vis")(vis_fea, deterministic)
        fea_vis = _SelfStack(cfg, cfg.num_blocks, name="att_vis_stack")(
            v, None, deterministic)
        s = _SybFeaPath(cfg, name="att_syb")(syb_ipt, deterministic)
        fea_syb = _SelfStack(cfg, cfg.num_blocks, name="att_syb_stack")(
            s, syb_graph, deterministic)

        fea, att_weights = _MILAlignJoint(cfg, name="MIL_align")(
            fea_vis, fea_syb, deterministic)
        mask = jnp.concatenate(
            [vis_mask_1d.astype(jnp.float32), syb_mask_1d.astype(jnp.float32)], axis=1)
        fea = fea * mask[..., None].astype(fea.dtype)

        glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="q_emb")
        dec = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name="q_mlp")(glove(q_ipt))
        dec = dec + nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(
            Embedding(cfg.maxlen_q, cfg.hidden_size, zeros_pad=False, scale=False,
                      dtype=dt, name="q_positional_encoding")(_positions(b, lq)))

        for i in range(cfg.num_blocks):
            dec = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"dec_vanilla_attention_{i}",
            )(dec, fea, fea, None, deterministic=deterministic)
            dec = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"dec_feed_forward_{i}")(dec)

        dec = dec * q_mask_1d.astype(dec.dtype)[..., None]
        pooled = jnp.max(dec, axis=1)
        h = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name="cls_hidden")(pooled))
        h = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(h)
        return nn.Dense(cfg.num_classes, dtype=dt, name="cls_out")(h), att_weights


class X7DecMil(nn.Module):
    """x7: interleaved joint self-attention + vis->syb cross alignment per
    block, question tokens attend the aligned pair, 1-token decoder over the
    question (`AttModel_x7_dec_mil.py:146-289`). Returns (logits, att_weights)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, vis_mask_1d, q_ipt, q_mask_1d, q_graph,
                 syb_ipt, syb_mask_1d, syb_graph, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b = vis_fea.shape[0]
        lq = q_ipt.shape[1]
        lv = vis_fea.shape[1]

        # x7 hardcodes its depths: 2-block self stacks, 3-block interleaved
        # alignment, 4 blocks everywhere else — the ctor's num_blocks arg is
        # overwritten (`AttModel_x7_dec_mil.py:168,174-176`)
        n_main = 4
        v = _VisFeaPath(cfg, name="att_vis")(vis_fea, deterministic)
        fea_vis = _SelfStack(cfg, 2, name="att_vis_stack")(v, None, deterministic)
        s = _SybFeaPath(cfg, name="att_syb")(syb_ipt, deterministic)
        fea_syb = _SelfStack(cfg, 2, name="att_syb_stack")(
            s, syb_graph, deterministic)

        att_weights = []
        for i in range(3):
            joint = jnp.concatenate([fea_vis, fea_syb], axis=1)
            joint = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"align_joint_{i}",
            )(joint, joint, joint, None, deterministic=deterministic)
            joint = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                                dtype=dt, name=f"align_joint_ffn_{i}")(joint)
            fea_vis, fea_syb = joint[:, :lv], joint[:, lv:]
            fea_vis, att = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                return_att=True, name=f"align_cross_{i}",
            )(fea_vis, fea_syb, fea_syb, None, deterministic=deterministic)
            fea_vis = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                                  dtype=dt, name=f"align_cross_ffn_{i}")(fea_vis)
            att_weights.append(att)

        fea_vis = fea_vis * vis_mask_1d.astype(fea_vis.dtype)[..., None]
        fea_syb = fea_syb * syb_mask_1d.astype(fea_syb.dtype)[..., None]

        glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="q_emb")
        q = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name="q_mlp")(glove(q_ipt))
        q = q + Embedding(cfg.maxlen_q, cfg.hidden_size, zeros_pad=False, scale=False,
                          dtype=dt, name="q_positional_encoding")(_positions(b, lq))
        q = GraphMaskAttention(num_units=cfg.hidden_size, num_heads=cfg.num_heads,
                               dtype=dt, name="q_self_attention")(
            q, q, q, None, deterministic=deterministic)
        q = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                        dtype=dt, name="q_self_feed_forward")(q)
        q = GraphMaskAttention(num_units=cfg.hidden_size, num_heads=cfg.num_heads,
                               dtype=dt, name="gq_self_attention")(
            q, q, q, q_graph, deterministic=deterministic)
        q = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                        dtype=dt, name="gq_self_feed_forward")(q)
        q = q * q_mask_1d.astype(q.dtype)[..., None]

        fused = jnp.concatenate([fea_vis, fea_syb], axis=1)
        for i in range(n_main):
            q = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"enc_self_attention_{i}",
            )(q, fused, fused, None, deterministic=deterministic)
            q = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                            dtype=dt, name=f"enc_feed_forward_{i}")(q)

        # 2-row BOS table, index 1 (`x7:240,279-280`)
        dec = Embedding(2, cfg.hidden_size, scale=True, dtype=dt,
                        name="dec_emb")(jnp.ones((b, 1), jnp.int32))
        for i in range(n_main):
            dec = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"dec_vanilla_attention_{i}",
            )(dec, q, q, None, deterministic=deterministic)
            dec = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"dec_feed_forward_{i}")(dec)

        h = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name="cls_hidden")(dec[:, 0]))
        h = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(h)
        return nn.Dense(cfg.num_classes, dtype=dt, name="cls_out")(h), att_weights


class X6DecMil(nn.Module):
    """x6: cross alignment vis->syb, super-node substitution of aligned visual
    rows into the symbolic sequence via idx_of_obj, then two staged
    (syb++q)/(sybvis++q) encoders each with a 1-token decoder, concat head
    (`AttModel_x6_dec_mil.py:118-322`). Returns (logits, att_weights)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, vis_mask_1d, q_ipt, q_mask_1d, q_graph,
                 syb_ipt, syb_mask_1d, syb_graph, idx_of_obj,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b = vis_fea.shape[0]
        lq = q_ipt.shape[1]
        ls = syb_ipt.shape[1]

        # the per-modality self stacks and the alignment stack are HARDCODED
        # to 2 blocks in the fork (`AttModel_x6_dec_mil.py:157-159`),
        # independent of num_blocks
        v = _VisFeaPath(cfg, name="att_vis")(vis_fea, deterministic)
        fea_vis = _SelfStack(cfg, 2, name="att_vis_stack")(v, None, deterministic)
        s = _SybFeaPath(cfg, name="att_syb")(syb_ipt, deterministic)
        fea_syb = _SelfStack(cfg, 2, name="att_syb_stack")(
            s, syb_graph, deterministic)

        # cross alignment: vis queries attend symbolic keys; last block's
        # attention feeds the MIL loss (`x6:136-146`)
        att_weights = []
        fv = fea_vis
        for i in range(2):
            fv, att = GraphMaskAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                return_att=True, name=f"align_cross_{i}",
            )(fv, fea_syb, fea_syb, None, deterministic=deterministic)
            fv = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                             dtype=dt, name=f"align_cross_ffn_{i}")(fv)
            att_weights.append(att)
        att_weights = [att_weights[-1]]
        fv = fv * vis_mask_1d.astype(fv.dtype)[..., None]

        # substitute aligned visual rows into the symbolic sequence at the
        # object super-node rows (`x6:243-246`). The fork indexes with the
        # raw values — torch wraps negatives to the END of the sequence, a
        # quirk kept here (loaders emit non-negative idx rows in practice)
        bi = jnp.arange(b)[:, None]
        safe = jnp.where(idx_of_obj >= 0, idx_of_obj, idx_of_obj + ls)
        n_obj = idx_of_obj.shape[1]
        fea_syb_vis = fea_syb.at[bi, safe].set(fv[:, :n_obj], mode="drop")

        glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="q_emb")
        q = _TwoLayerMLP(cfg.hidden_size, cfg.hidden_size, dt, name="q_mlp")(glove(q_ipt))
        q = q + Embedding(cfg.maxlen_q, cfg.hidden_size, zeros_pad=False, scale=False,
                          dtype=dt, name="q_positional_encoding")(_positions(b, lq))
        q = GraphMaskAttention(num_units=cfg.hidden_size, num_heads=cfg.num_heads,
                               dtype=dt, name="q_self_attention")(
            q, q, q, None, deterministic=deterministic)
        q = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                        dtype=dt, name="q_self_feed_forward")(q)
        q = q * q_mask_1d.astype(q.dtype)[..., None]

        # key-validity diagonal blocks (`x6:265-267` — masks broadcast over
        # query rows in BOTH the symbolic and the substituted branch), zeroed
        # diag in the cross stage, ones+graphs in the final stage
        stages = _stage_graphs_1d(syb_mask_1d, q_mask_1d, q_graph, syb_graph,
                                  "x2", visual=False)
        plan = ([stages[0]] * cfg.stage1_blocks
                + [stages[1]] * (cfg.stage2_blocks - cfg.stage1_blocks)
                + [stages[2]] * (cfg.num_blocks - cfg.stage2_blocks))

        # one SHARED 2-row decoder BOS table for both branches
        # (`x6:229,289-291` — a single top-level dec_emb, index 1)
        dec_emb = Embedding(2, cfg.hidden_size, scale=True, dtype=dt, name="dec_emb")

        def staged_branch(name, seq):
            fea = jnp.concatenate([seq, q], axis=1)
            for i, g in enumerate(plan):
                fea = GraphMaskAttention(
                    num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                    name=f"{name}_enc_self_attention_{i}",
                )(fea, fea, fea, g, deterministic=deterministic)
                fea = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                                  dtype=dt, name=f"{name}_enc_feed_forward_{i}")(fea)
            dec = dec_emb(jnp.ones((b, 1), jnp.int32))
            for i in range(cfg.num_blocks):
                dec = GraphMaskAttention(
                    num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                    name=f"{name}_dec_vanilla_attention_{i}",
                )(dec, fea, fea, None, deterministic=deterministic)
                dec = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                                  dtype=dt, name=f"{name}_dec_feed_forward_{i}")(dec)
            return dec[:, 0]

        dec_vq = staged_branch("vq", fea_syb_vis)
        dec_sq = staged_branch("sq", fea_syb)
        fused = jnp.concatenate([dec_vq, dec_sq], axis=1)
        h = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name="cls_hidden")(fused))
        h = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(h)
        return nn.Dense(cfg.num_classes, dtype=dt, name="cls_out")(h), att_weights




class _OneTokenDecoder(nn.Module):
    """Standalone 1-token decoder stack (`AttModel_x2_fusion_dec_mil.py:168-215`)."""

    cfg: ModelConfig
    pe_table_size: int

    @nn.compact
    def __call__(self, fea, dec_mask, deterministic=True):
        from structured_alignment_vqa_tpu.ops.attention import MultiHeadAttention
        from structured_alignment_vqa_tpu.models.att_model_x3 import BOS_ID

        cfg = self.cfg
        dt = cfg.compute_dtype
        b = fea.shape[0]
        dec = Embedding(cfg.num_classes, cfg.hidden_size, zeros_pad=True, scale=True,
                        dtype=dt, name="dec_emb")(jnp.full((b, 1), BOS_ID, jnp.int32))
        dec = dec + Embedding(self.pe_table_size, cfg.hidden_size, zeros_pad=False,
                              scale=False, dtype=dt, name="dec_positional_encoding")(
            jnp.zeros((b, 1), jnp.int32))
        dec = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(dec)
        for i in range(cfg.num_blocks):
            dec = MultiHeadAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, causality=True,
                dtype=dt, name=f"dec_self_attention_{i}",
            )(dec, dec, dec, deterministic=deterministic)
            dec = GraphGuidedAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"dec_vanilla_attention_{i}",
            )(dec, fea, fea, dec_mask, deterministic=deterministic)
            dec = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"dec_feed_forward_{i}")(dec)
        return dec


class _StagedEncoderOnly(nn.Module):
    """The x2_dec/x3 staged encoder WITHOUT the decoder; returns the encoded
    sequence and the decoder mask (`AttModel_x2_fusion_dec_mil.py:97-164`)."""

    cfg: ModelConfig
    pe_table_size: int
    ids_input: bool  # symbolic branch embeds [ids ++ q ids] jointly
    # the fusion_dec_mil line's syb_mlps are bare Linears — the ReLU'd
    # Sequential is commented out (`AttModel_x2_fusion_dec_mil.py:34-38,
    # 232-234`); x3_ori's vis branch re-enables the ReLU
    mlp_relu: bool = False

    @nn.compact
    def __call__(self, modality, modality_mask, modality_graph, q_ipt, q_graph,
                 q_mask, glove, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        if self.ids_input:
            b, lm = modality.shape
            joint = jnp.concatenate([modality, q_ipt], axis=1)
            fea = _TwoLayerMLP(cfg.vis_fea_dim, cfg.hidden_size, dt,
                               relu=self.mlp_relu, name="syb_mlp")(glove(joint))
        else:
            b, lm = modality.shape[:2]
            q_fea = nn.Dense(cfg.vis_fea_dim, dtype=dt, name="syb_mlp")(glove(q_ipt))
            if self.mlp_relu:
                q_fea = jax.nn.relu(q_fea)
            fea = jnp.concatenate([modality.astype(dt), q_fea], axis=1)
            fea = nn.Dense(cfg.hidden_size, dtype=dt, name="syb_mlp2")(fea)
        size = fea.shape[1]
        fea = fea + Embedding(self.pe_table_size, cfg.hidden_size, zeros_pad=False,
                              scale=False, dtype=dt, name="syb_positional_encoding")(
            _positions(b, size))
        fea = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(fea)

        graph_diag, graph_cross, graph, dec_mask = build_stage_graphs(
            modality_mask, q_mask, q_graph, modality_graph,
            use_dec_mask=cfg.use_dec_mask,
            distinct_cross_stage=cfg.distinct_cross_stage,
        )
        for i in range(cfg.num_blocks):
            g = graph_diag if i < cfg.stage1_blocks else (
                graph_cross if i < cfg.stage2_blocks else graph)
            fea = GraphGuidedAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"enc_self_attention_{i}", use_pallas=cfg.use_pallas_attention,
            )(fea, fea, fea, g, deterministic=deterministic)
            fea = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"enc_feed_forward_{i}")(fea)
        return fea, dec_mask


class _MILAlignRef(nn.Module):
    """The fusion_dec_mil line's MIL alignment stack
    (`AttModel_x2_fusion_dec_mil.py:425-456`,
    `AttModel_x2_fusion_dec_mil2.py:363-393`): adds its own PE to the visual
    queries, then 3 blocks of graph-GUIDED (L1-renorm) cross-attention whose
    'graph' is the (B, Lq, 1) query-validity column — invalid query rows are
    zeroed by the multiply and stay zero through the L1 clamp. Live attention
    dropout (the only module in the family with a nonzero rate,
    `mil:437`/`mil2:375`)."""

    cfg: ModelConfig
    num_units: int
    n_blocks: int = 3
    keep: str = "all"  # 'all' (mil) | 'last' (mil2)

    @nn.compact
    def __call__(self, vis_fea, vis_valid, syb_fea, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, lv = vis_fea.shape[:2]
        vis_fea = vis_fea + Embedding(
            cfg.maxlen, self.num_units, zeros_pad=False, scale=False, dtype=dt,
            name="syb_positional_encoding",
        )(_positions(b, lv))
        att_weights = []
        for i in range(self.n_blocks):
            vis_fea, att = GraphGuidedAttention(
                num_units=self.num_units, num_heads=cfg.num_heads,
                dropout_rate=cfg.dropout_rate, return_att=True, dtype=dt,
                name=f"enc_self_attention_{i}",
            )(vis_fea, syb_fea, syb_fea, vis_valid, deterministic=deterministic)
            vis_fea = FeedForward(self.num_units, (4 * self.num_units, self.num_units),
                                  dtype=dt, name=f"enc_feed_forward_{i}")(vis_fea)
            att_weights.append(att)
        if self.keep == "last":
            att_weights = [att_weights[-1]]
        return vis_fea, att_weights


class X2FusionDecMil(nn.Module):
    """fusion_dec_mil: split encoders, cross MIL alignment between the encoded
    sequences, then 1-token decoders — the reference reuses the *visual*
    decoder for both branches (`AttModel_x2_fusion_dec_mil.py:537-538`), a
    quirk preserved here. Returns (logits_concat, logits_vis, logits_syb,
    att_weights)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, vis_mask, q_ipt, q_mask, q_graph, syb_ipt,
                 syb_mask, syb_graph, vis_graph=None, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        vis_glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="vis_syb_emb")
        syb_glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="syb_syb_emb")

        fea_vis, dec_mask_vis = _StagedEncoderOnly(
            cfg, cfg.maxlen, ids_input=False, name="att_vis_enc",
        )(vis_fea, vis_mask, vis_graph, q_ipt, q_graph, q_mask, vis_glove, deterministic)
        fea_syb, dec_mask_syb = _StagedEncoderOnly(
            cfg, cfg.maxlen + cfg.maxlen_q, ids_input=True, name="att_syb_enc",
        )(syb_ipt, syb_mask, syb_graph, q_ipt, q_graph, q_mask, syb_glove, deterministic)

        # valid_mask = dec_mask^T: the encoded [vis ++ q] row validity column
        # (`AttModel_x2_fusion_dec_mil.py:135,534`)
        fea_vis_align, att_weights = _MILAlignRef(
            cfg, cfg.hidden_size, keep="all", name="MIL_align",
        )(fea_vis, jnp.swapaxes(dec_mask_vis, 1, 2), fea_syb, deterministic)

        dec = _OneTokenDecoder(cfg, cfg.maxlen, name="att_vis_dec")
        dec_vis = dec(fea_vis_align, dec_mask_vis, deterministic)
        dec_syb = dec(fea_syb, dec_mask_syb, deterministic)  # same weights (quirk)

        def head(prefix, x):
            x = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name=f"{prefix}_hidden")(x))
            x = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(x)
            return nn.Dense(cfg.num_classes, dtype=dt, name=f"{prefix}_out")(x)

        logits_vis = head("cls_vis", dec_vis)[:, 0]
        logits_syb = head("cls_syb", dec_syb)[:, 0]
        fused = jnp.concatenate([dec_vis[:, 0], dec_syb[:, 0]], axis=1)
        logits_concat = head("cls", fused)
        return logits_concat, logits_vis, logits_syb, att_weights


class X2FusionDecMil2(nn.Module):
    """fusion_dec_mil2: align the RAW visual features against embedded symbolic
    nodes *before* the dual encoders (`AttModel_x2_fusion_dec_mil2.py:444-474`);
    keeps only the last alignment block's weights. Returns (logits_concat,
    logits_vis, logits_syb, att_weights)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, vis_mask, q_ipt, q_mask, q_graph, syb_ipt,
                 syb_mask, syb_graph, vis_graph=None, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="syb_emb")
        # syb_mlp0 is a bare Linear(300, 2048); syb_mlp1 exists but is dead
        # (`AttModel_x2_fusion_dec_mil2.py:440-441,450-451`)
        fea_syb_emb = nn.Dense(cfg.vis_fea_dim, dtype=dt, name="syb_mlp0")(
            glove(syb_ipt))

        # vis validity column from the square mask's row sums (`mil2:454-459`)
        vis_valid = (jnp.sum(vis_mask.astype(jnp.float32), axis=2) > 0
                     ).astype(jnp.float32)[..., None]
        fea_vis_align, att_weights = _MILAlignRef(
            cfg, cfg.vis_fea_dim, keep="last", name="MIL_align",
        )(vis_fea.astype(dt), vis_valid, fea_syb_emb, deterministic)

        out = X2DecModel(cfg, heads="triple", mlp_relu=False, name="body")(
            fea_vis_align, vis_mask, q_ipt, q_mask, q_graph, syb_ipt, syb_mask,
            syb_graph, vis_graph=vis_graph, deterministic=deterministic,
        )
        return out + (att_weights,)




class X2FusionDecRelatt(nn.Module):
    """fusion_dec_relatt: the visual branch runs over the *vis-symbolic node
    graph* (loader `emit_visrel` output) with raw region features substituted
    into the object-node rows before projection
    (`AttModel_x2_fusion_dec_relatt.py:72-163`); symbolic branch and triple
    heads as in the x2_dec line. ``vis_syb_link`` is (B, N): region index per
    vis-symbolic node row, -1 where the row is not an object node."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, vis_syb_ipt, vis_syb_mask, vis_syb_link,
                 vis_syb_graph, q_ipt, q_mask, q_graph, syb_ipt, syb_mask,
                 syb_graph, vis_graph_enabled: bool = True,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        from structured_alignment_vqa_tpu.ops.attention import MultiHeadAttention

        glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="vis_syb_emb")
        b, n_nodes = vis_syb_ipt.shape
        lq = q_ipt.shape[1]
        joint = jnp.concatenate([vis_syb_ipt, q_ipt], axis=1)
        # bare Linear(300, 2048) — the line's commented-out ReLU
        # (`AttModel_x2_fusion_dec_relatt.py:26`)
        fea = nn.Dense(cfg.vis_fea_dim, dtype=dt, name="syb_mlp")(glove(joint))

        # Substitute raw region features into the object-node rows. The
        # reference assigns regions SEQUENTIALLY, not by link value: the j-th
        # link-valid node row takes vis_fea[:, j]
        # (`relatt:92-94` — ``fea[b, (link+1).nonzero()] = vis_fea[b, :k]``).
        bi = jnp.arange(b)[:, None]
        valid1 = vis_syb_link >= 0                                # (B, N)
        rank = jnp.cumsum(valid1.astype(jnp.int32), axis=1) - 1   # j-th valid -> j
        rank = jnp.clip(rank, 0, vis_fea.shape[1] - 1)
        subst = vis_fea[bi, rank].astype(fea.dtype)               # (B, N, 2048)
        node_part = jnp.where(valid1[..., None], subst, fea[:, :n_nodes])
        fea = jnp.concatenate([node_part, fea[:, n_nodes:]], axis=1)

        fea = nn.Dense(cfg.hidden_size, dtype=dt, name="syb_mlp2")(fea)
        fea = fea + Embedding(cfg.maxlen, cfg.hidden_size, zeros_pad=False,
                              scale=False, dtype=dt, name="syb_positional_encoding")(
            _positions(b, n_nodes + lq))
        fea = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(fea)

        graph_diag, graph_cross, graph, dec_mask = build_stage_graphs(
            vis_syb_mask, q_mask, q_graph,
            vis_syb_graph if vis_graph_enabled else None,
            use_dec_mask=cfg.use_dec_mask,
            distinct_cross_stage=cfg.distinct_cross_stage,
        )
        for i in range(cfg.num_blocks):
            g = graph_diag if i < cfg.stage1_blocks else (
                graph_cross if i < cfg.stage2_blocks else graph)
            fea = GraphGuidedAttention(
                num_units=cfg.hidden_size, num_heads=cfg.num_heads, dtype=dt,
                name=f"enc_self_attention_{i}", use_pallas=cfg.use_pallas_attention,
            )(fea, fea, fea, g, deterministic=deterministic)
            fea = FeedForward(cfg.hidden_size, (4 * cfg.hidden_size, cfg.hidden_size),
                              dtype=dt, name=f"enc_feed_forward_{i}")(fea)

        dec = _OneTokenDecoder(cfg, cfg.maxlen, name="att_vis_dec")(fea, dec_mask, deterministic)
        fea_vis = dec

        # symbolic branch: standard ids-input staged encoder + decoder
        syb_glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="syb_syb_emb")
        fea_s, dec_mask_s = _StagedEncoderOnly(
            cfg, cfg.maxlen + cfg.maxlen_q, ids_input=True, name="att_syb_enc",
        )(syb_ipt, syb_mask, syb_graph, q_ipt, q_graph, q_mask, syb_glove, deterministic)
        fea_syb = _OneTokenDecoder(cfg, cfg.maxlen + cfg.maxlen_q,
                                   name="att_syb_dec")(fea_s, dec_mask_s, deterministic)

        def head(prefix, x):
            x = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name=f"{prefix}_hidden")(x))
            x = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(x)
            return nn.Dense(cfg.num_classes, dtype=dt, name=f"{prefix}_out")(x)

        logits_vis = head("cls_vis", fea_vis)[:, 0]
        logits_syb = head("cls_syb", fea_syb)[:, 0]
        fused = jnp.concatenate([fea_syb[:, 0], fea_vis[:, 0]], axis=1)
        logits_concat = head("cls", fused)
        return logits_concat, logits_vis, logits_syb


PAD_ID = 400000  # `AttModel_x3_ori.py:12` — MIL relation candidate padding


class _MILNCELoop(nn.Module):
    """x3_ori's MIL-NCE: the batch-loop precursor of the production
    :class:`~..att_model_x3.MILNCEModule` (`AttModel_x3_ori.py:281-421`).

    Semantics preserved exactly (they differ from the production module):

    * obj loss = SUM over the batch of per-sample ``log(Σ mask·e^pos /
      (Σ mask·e^pos + Σ mask·e^neg))`` — raw exp, no logsumexp (`:356-359`);
    * relation candidates index a per-PAIR bilinear score vector
      ``x_i^T W x_j`` over ALL relations, softmaxed over relations
      (`:384-404`); candidates equal to PAD (400000) are skipped;
    * EVERY ordered object pair (i≠j) writes ``rel_mlp(new_rel_fea)`` into
      its macro row — even all-PAD pairs, whose contribution is
      ``rel_mlp(0)`` = pure bias (`:409-412`); writes happen in pair order
      (later pairs overwrite), and a negative ``macro_rel_loc`` wraps to the
      END of the sequence (torch negative indexing);
    * the accumulating macro tensor is repeatedly detached (`:343,367,411`)
      — realized as stop_gradient on the embedding path.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, macro_ipt, macro_obj_loc, macro_rel_loc,
                 micro_pos_obj, micro_neg_obj, micro_obj_mask,
                 micro_pos_rel, micro_neg_rel):
        cfg = self.cfg
        h = cfg.hidden_size_mil
        dt = cfg.compute_dtype
        b, ls = macro_ipt.shape
        o = vis_fea.shape[1]

        glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt, name="syb_emb")
        macro_fea = jax.nn.relu(nn.Dense(h, dtype=dt, name="marco_mlp")(glove(macro_ipt)))
        new_macro = jax.lax.stop_gradient(macro_fea)

        syb_mlp = nn.Dense(h, dtype=dt, name="syb_mlp")
        pos_fea = jax.nn.relu(syb_mlp(glove(micro_pos_obj)))     # (B, O, T, h)
        neg_fea = jax.nn.relu(syb_mlp(glove(micro_neg_obj)))
        vis_emb = jax.nn.relu(nn.Dense(h, dtype=dt, name="vis_mlp")(
            vis_fea.astype(dt)))                                  # (B, O, h)

        pos_scores = jnp.einsum("both,boh->bot", pos_fea, vis_emb,
                                preferred_element_type=jnp.float32)
        neg_scores = jnp.einsum("both,boh->bot", neg_fea, vis_emb,
                                preferred_element_type=jnp.float32)
        m = micro_obj_mask.astype(jnp.float32)
        nume = jnp.sum(m * jnp.exp(pos_scores), axis=(1, 2))      # (B,)
        deno = nume + jnp.sum(m * jnp.exp(neg_scores), axis=(1, 2))
        mil_obj = jnp.sum(jnp.log(nume / deno))

        w = jax.nn.softmax(pos_scores, axis=2).astype(pos_fea.dtype)
        new_obj = jnp.sum(w[..., None] * pos_fea, axis=2)         # (B, O, h)

        bi = jnp.arange(b)[:, None]
        safe_loc = jnp.where(macro_obj_loc >= 0, macro_obj_loc, ls)
        new_macro = new_macro.at[bi, safe_loc].set(
            new_obj.astype(new_macro.dtype), mode="drop")

        # ---- relations over all ordered pairs, in reference pair order ----
        W = self.param("bilinear", nn.initializers.xavier_normal(),
                       (cfg.num_relations, h, h), jnp.float32)
        pairs = [(i, j) for i in range(o) for j in range(o) if i != j]
        pi = jnp.asarray([p[0] for p in pairs])
        pj = jnp.asarray([p[1] for p in pairs])
        xi = new_obj[:, pi].astype(jnp.float32)                   # (B, P, h)
        xj = new_obj[:, pj].astype(jnp.float32)
        rels = jnp.einsum("bph,rhg,bpg->bpr", xi, W, xj)          # (B, P, R)
        sm = jax.nn.softmax(rels, axis=-1)

        p_cand = micro_pos_rel[:, :len(pairs)]                    # (B, P, C)
        n_cand = micro_neg_rel[:, :len(pairs)]
        valid = (p_cand != PAD_ID)
        cp = jnp.clip(p_cand, 0, cfg.num_relations - 1)
        cn = jnp.clip(n_cand, 0, cfg.num_relations - 1)
        gp = jnp.take_along_axis(rels, cp, axis=-1)               # (B, P, C)
        gn = jnp.take_along_axis(rels, cn, axis=-1)
        vf = valid.astype(jnp.float32)
        nume_r = jnp.sum(vf * jnp.exp(gp), axis=-1)               # (B, P)
        deno_r = nume_r + jnp.sum(vf * jnp.exp(gn), axis=-1)
        mil_rel = jnp.sum(jnp.where(deno_r > 0.0,
                                    jnp.log(nume_r / jnp.maximum(deno_r, 1e-30)),
                                    0.0))

        # softmax weight of each positive candidate's relation
        wp = jnp.take_along_axis(sm, cp, axis=-1) * vf            # (B, P, C)
        coeff = jnp.sum(jax.nn.one_hot(cp, cfg.num_relations) * wp[..., None],
                        axis=2)                                   # (B, P, R)
        new_rel_fea = jnp.einsum("bpr,rhg->bphg", coeff, W)       # (B, P, h, h)
        rel_h = jax.nn.relu(nn.Dense(h, dtype=dt, name="rel_mlp_fc1")(
            new_rel_fea.astype(dt)))
        rel_out = nn.Dense(1, dtype=dt, name="rel_mlp_fc2")(rel_h)[..., 0]  # (B, P, h)

        loc = macro_rel_loc[:, :len(pairs)]
        wrapped = jnp.where(loc >= 0, loc, loc + ls)
        barange = jnp.arange(b)
        for p in range(len(pairs)):  # ordered writes — later pairs overwrite
            new_macro = new_macro.at[barange, wrapped[:, p]].set(
                rel_out[:, p].astype(new_macro.dtype))

        out = jax.nn.relu(nn.Dense(cfg.vis_fea_dim, dtype=dt, name="ipt_mlp")(new_macro))
        return out, mil_obj, mil_rel


class X3OriModel(nn.Module):
    """AttModel_x3_ori: the production x3 body with (a) maxlen-sized symbolic
    PE/decoder tables instead of maxlen+maxlen_q (`AttModel_x3_ori.py:174,183`),
    (b) NO visual-branch graph input (vis block constant 1, `:119`), and
    (c) the batch-loop MIL above. Returns
    (logits_concat, logits_vis, logits_syb, mil_obj, mil_rel)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, vis_fea, vis_mask, q_ipt, q_mask, q_graph, macro_ipt,
                 macro_mask, macro_graph, macro_obj_loc, macro_rel_loc,
                 micro_pos_obj, micro_neg_obj, micro_obj_mask,
                 micro_pos_rel, micro_neg_rel, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype

        new_macro, mil_obj, mil_rel = _MILNCELoop(cfg, name="mil_nce")(
            vis_fea, macro_ipt, macro_obj_loc, macro_rel_loc,
            micro_pos_obj, micro_neg_obj, micro_obj_mask,
            micro_pos_rel, micro_neg_rel)

        vis_glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt,
                               name="vis_syb_emb")
        fea_vis = _EncoderDecoder(
            cfg, pe_table_size=cfg.maxlen, pe_dropout=True, name="att_vis_grid",
        )(vis_fea, vis_mask, None, q_ipt, q_graph, q_mask, vis_glove, deterministic)

        syb_glove = GloVeEmbed(cfg.vocab_size, cfg.glove_dim, dtype=dt,
                               name="syb_syb_emb")
        fea_syb = _EncoderDecoder(
            cfg, pe_table_size=cfg.maxlen, pe_dropout=False, name="att_syb",
        )(new_macro, macro_mask, macro_graph, q_ipt, q_graph, q_mask, syb_glove,
          deterministic)

        def head(prefix, x):
            x = jax.nn.relu(nn.Dense(cfg.hidden_size, dtype=dt, name=f"{prefix}_hidden")(x))
            x = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(x)
            return nn.Dense(cfg.num_classes, dtype=dt, name=f"{prefix}_out")(x)

        logits_vis = head("cls_vis", fea_vis)[:, 0]
        logits_syb = head("cls_syb", fea_syb)[:, 0]
        fused = jnp.concatenate([fea_syb[:, 0], fea_vis[:, 0]], axis=1)
        logits_concat = head("cls", fused)
        return logits_concat, logits_vis, logits_syb, mil_obj, mil_rel


# ---- registry: reference model name -> (class, kwargs) --------------------------

VARIANTS = {
    "x": (MaxPoolDualEncoder, {"stage_style": "x"}),
    "x2": (MaxPoolDualEncoder, {"stage_style": "x2"}),
    "x2_pre": (MaxPoolDualEncoder, {"stage_style": "x2"}),  # byte-identical fork
    # distill: query-validity diag masks, constant-1 cross stage, masked
    # symbolic max-pool (`AttModel_x2_distill.py:75-83,159-186`)
    "x2_distill": (MaxPoolDualEncoder, {"stage_style": "x2_distill"}),
    # x2_dec / x2_syb_dec: bare-Linear syb_mlp (the fork comments out the
    # ReLU, `AttModel_x2_dec.py:38,374`); parity-tested vs the live fork
    "x2_dec": (X2DecModel, {"heads": "single", "mlp_relu": False}),
    # ori is NOT an x2_dec twin: graph-mask (sum+1e-7) attention with live
    # dropout, PE-less self-attention-free decoder (`AttModel_x2_dec_ori.py`)
    "x2_dec_ori": (X2DecOriModel, {}),
    # mlp_dec: live v_mlp, ReLU'd syb_mlp_sequence, vanilla decoder cross-attn
    # (`AttModel_x2_mlp_dec.py:42-43,107,227-231,324`), parity-tested
    "x2_mlp_dec": (X2DecModel, {"heads": "single", "vis_v_mlp": True,
                                "dec_cross": "vanilla"}),
    # x2_syb_dec is byte-identical to x2_fusion_dec (one blank line apart):
    # triple heads + the line's bare-Linear syb_mlp; both parity-tested live
    "x2_syb_dec": (X2DecModel, {"heads": "triple", "mlp_relu": False}),
    "x2_fusion_dec": (X2DecModel, {"heads": "triple", "mlp_relu": False}),
    "x2_fusion_dec_relatt": (X2FusionDecRelatt, {}),
    "x2_fusion_dec_mil": (X2FusionDecMil, {}),
    "x2_fusion_dec_mil2": (X2FusionDecMil2, {}),
    # x3_ori is an early AttModel_x3 (maxlen PE tables, no vis graph, the
    # batch-loop MIL), NOT an x2_dec twin — parity-tested live
    "x3_ori": (X3OriModel, {}),
    "x4_dec": (X4DecModel, {}),
    "x5_dec_mil": (X5DecMil, {}),
    "x6_dec_mil": (X6DecMil, {}),
    "x7_dec_mil": (X7DecMil, {}),
}


def build_variant(name: str, cfg: ModelConfig) -> nn.Module:
    """Instantiate an ablation model by its reference name (e.g. 'x2_dec')."""
    if name in ("x3", "v3"):
        from structured_alignment_vqa_tpu.models.att_model_x3 import AttModelX3

        return AttModelX3(cfg)
    cls, kw = VARIANTS[name]
    return cls(cfg, **kw)

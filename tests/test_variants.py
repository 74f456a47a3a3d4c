"""Variant-model matrix tests: every registry entry initializes, runs forward,
and produces finite outputs of the right shape; ATTMILLoss oracle parity."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.models.config import tiny_test_config
from structured_alignment_vqa_tpu.models.variants import (
    VARIANTS,
    MaxPoolDualEncoder,
    X2DecModel,
    X4DecModel,
    X5DecMil,
    X6DecMil,
    X7DecMil,
    build_variant,
)
from structured_alignment_vqa_tpu.train.att_mil_loss import att_mil_loss

B, LV, LS, LQ = 2, 4, 6, 5


def make_inputs(cfg, rng):
    vis_fea = jnp.asarray(rng.standard_normal((B, LV, cfg.vis_fea_dim)).astype(np.float32))
    q_ipt = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, (B, LQ)), jnp.int32)
    syb_ipt = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, (B, LS)), jnp.int32)
    q_mask_1d = jnp.asarray((rng.random((B, LQ)) > 0.2).astype(np.float32))
    syb_mask_1d = jnp.asarray((rng.random((B, LS)) > 0.2).astype(np.float32))
    vis_mask_1d = jnp.ones((B, LV), jnp.float32)
    q_graph = jnp.asarray((rng.random((B, LQ, LQ)) > 0.5).astype(np.float32))
    syb_graph = jnp.asarray((rng.random((B, LS, LS)) > 0.5).astype(np.float32))
    return vis_fea, vis_mask_1d, q_ipt, q_mask_1d, q_graph, syb_ipt, syb_mask_1d, syb_graph


def square(mask_1d, size):
    out = np.zeros((B, size, size), np.float32)
    m = np.asarray(mask_1d)
    for i in range(B):
        n = int(m[i].sum())
        out[i, :n, :n] = 1
    return jnp.asarray(out)


@pytest.fixture
def cfg():
    return tiny_test_config(maxlen_v=LV, maxlen=LS + 4, maxlen_q=LQ)


def check(out, cfg):
    assert out.shape == (B, cfg.num_classes)
    assert np.isfinite(np.asarray(out)).all()


class TestMaxPoolFamily:
    @pytest.mark.parametrize("style", ["x", "x2"])
    def test_forward(self, cfg, rng, style):
        vis, _, q, qm, qg, syb, sm, sg = make_inputs(cfg, rng)
        model = MaxPoolDualEncoder(cfg, stage_style=style)
        params = model.init(jax.random.key(0), vis, q, qm, qg, syb, sm, sg)
        out = model.apply(params, vis, q, qm, qg, syb, sm, sg)
        check(out, cfg)


class TestX2DecFamily:
    @pytest.mark.parametrize("heads", ["single", "triple"])
    def test_forward(self, cfg, rng, heads):
        vis, _, q, qm1, qg, syb, sm1, sg = make_inputs(cfg, rng)
        qm = square(qm1, LQ)
        sm = square(sm1, LS)
        vm = square(jnp.ones((B, LV)), LV)
        model = X2DecModel(cfg, heads=heads)
        args = (vis, vm, q, qm, qg, syb, sm, sg)
        params = model.init(jax.random.key(0), *args)
        out = model.apply(params, *args)
        if heads == "triple":
            for o in out:
                check(o, cfg)
        else:
            check(out, cfg)

    def test_vis_graph_option(self, cfg, rng):
        """visGraph=True: vis block adjacency from input changes the output."""
        vis, _, q, qm1, qg, syb, sm1, sg = make_inputs(cfg, rng)
        qm = square(qm1, LQ)
        sm = square(sm1, LS)
        vm = square(jnp.ones((B, LV)), LV)
        vg = jnp.asarray((np.asarray(jax.random.uniform(jax.random.key(5), (B, LV, LV))) > 0.6).astype(np.float32))
        model = X2DecModel(cfg, heads="single")
        params = model.init(jax.random.key(0), vis, vm, q, qm, qg, syb, sm, sg)
        out_fc = model.apply(params, vis, vm, q, qm, qg, syb, sm, sg, vis_graph=None)
        out_vg = model.apply(params, vis, vm, q, qm, qg, syb, sm, sg, vis_graph=vg)
        check(out_vg, cfg)
        assert not np.allclose(np.asarray(out_fc), np.asarray(out_vg))


class TestX4Dec:
    def test_forward(self, cfg, rng):
        vis, vm, q, qm, qg, syb, sm, sg = make_inputs(cfg, rng)
        model = X4DecModel(cfg)
        args = (vis, vm, q, qm, qg, syb, sm, sg)
        params = model.init(jax.random.key(0), *args)
        check(model.apply(params, *args), cfg)


class TestMilFamily:
    def test_x5(self, cfg, rng):
        vis, vm, q, qm, qg, syb, sm, sg = make_inputs(cfg, rng)
        model = X5DecMil(cfg)
        args = (vis, vm, q, qm, qg, syb, sm, sg)
        params = model.init(jax.random.key(0), *args)
        logits, atts = model.apply(params, *args)
        check(logits, cfg)
        assert len(atts) == cfg.num_blocks
        assert atts[0].shape == (B, cfg.num_heads, LV + LS, LV + LS)

    def test_x7(self, cfg, rng):
        vis, vm, q, qm, qg, syb, sm, sg = make_inputs(cfg, rng)
        model = X7DecMil(cfg)
        args = (vis, vm, q, qm, qg, syb, sm, sg)
        params = model.init(jax.random.key(0), *args)
        logits, atts = model.apply(params, *args)
        check(logits, cfg)
        assert atts[0].shape == (B, cfg.num_heads, LV, LS)

    def test_x6(self, cfg, rng):
        vis, vm, q, qm, qg, syb, sm, sg = make_inputs(cfg, rng)
        idx_of_obj = jnp.asarray(np.stack([
            np.array([0, 2, 4, -1]), np.array([1, 3, -1, -1])
        ]), jnp.int32)
        model = X6DecMil(cfg)
        args = (vis, vm, q, qm, qg, syb, sm, sg, idx_of_obj)
        params = model.init(jax.random.key(0), *args)
        logits, atts = model.apply(params, *args)
        check(logits, cfg)
        assert len(atts) == 1  # x6 keeps only the last block's weights
        assert atts[0].shape == (B, cfg.num_heads, LV, LS)


def test_registry_complete():
    # every transformers/ model family member is mapped
    for name in ("x", "x2", "x2_pre", "x2_distill", "x2_dec", "x2_dec_ori",
                 "x2_mlp_dec", "x2_syb_dec", "x2_fusion_dec",
                 "x2_fusion_dec_relatt", "x2_fusion_dec_mil", "x2_fusion_dec_mil2",
                 "x3_ori", "x4_dec", "x5_dec_mil",
                 "x6_dec_mil", "x7_dec_mil"):
        assert name in VARIANTS
    cfg = tiny_test_config()
    m = build_variant("x3", cfg)
    from structured_alignment_vqa_tpu.models import AttModelX3
    assert isinstance(m, AttModelX3)


class TestAttMilLoss:
    def test_matches_sequential_oracle(self, rng):
        blocks, b, h, o, ls = 2, 3, 2, 4, 6
        atts = [jnp.asarray(rng.random((b, h, o, ls)).astype(np.float32))
                for _ in range(blocks)]
        idx = np.full((b, o), -1, np.int64)
        idx[0, :3] = [0, 2, 4]
        idx[1, :2] = [1, 3]
        idx[2, :4] = [0, 1, 2, 3]
        graph = (rng.random((b, ls, ls)) > 0.5).astype(np.float32)
        got = float(att_mil_loss(atts, jnp.asarray(idx, jnp.int32), jnp.asarray(graph)))

        # sequential oracle mirroring margin_rank_loss.py:52-84
        margin = 0.6
        pos_ws = torch.zeros(blocks * b * ls)
        neg_ws = torch.zeros(blocks * b * ls)
        slot = 0
        for bl in range(blocks):
            att0 = np.asarray(atts[bl])[:, 0]  # head 0
            for i in range(b):
                for k in range(o):
                    if idx[i, k] < 0:
                        continue
                    att_row = att0[i, k]
                    idx_row = graph[i, idx[i, k]]
                    pos_ws[slot] = float(att_row[idx_row > 0].sum())
                    neg_ws[slot] = float(att_row[idx_row == 0].sum())
                    slot += 1
        want = float(torch.nn.MarginRankingLoss(margin)(pos_ws, neg_ws, torch.ones(blocks * b * ls)))
        assert abs(got - want) < 1e-5


class TestFusionMilFamily:
    def test_x2_fusion_dec_mil(self, cfg, rng):
        from structured_alignment_vqa_tpu.models.variants import X2FusionDecMil

        vis, _, q, qm1, qg, syb, sm1, sg = make_inputs(cfg, rng)
        qm = square(qm1, LQ)
        sm = square(sm1, LS)
        vm = square(jnp.ones((B, LV)), LV)
        model = X2FusionDecMil(cfg)
        args = (vis, vm, q, qm, qg, syb, sm, sg)
        params = model.init(jax.random.key(0), *args)
        lc, lv_, ls_, atts = model.apply(params, *args)
        for o in (lc, lv_, ls_):
            check(o, cfg)
        assert len(atts) == cfg.num_blocks
        # cross alignment: vis+q queries over syb+q keys
        assert atts[0].shape == (B, cfg.num_heads, LV + LQ, LS + LQ)
        # quirk: both branches decode through the SAME (visual) decoder params
        flat = params["params"]
        assert "att_vis_dec" in flat and "att_syb_dec" not in flat

    def test_x2_fusion_dec_mil2(self, cfg, rng):
        from structured_alignment_vqa_tpu.models.variants import X2FusionDecMil2

        vis, _, q, qm1, qg, syb, sm1, sg = make_inputs(cfg, rng)
        qm = square(qm1, LQ)
        sm = square(sm1, LS)
        vm = square(jnp.ones((B, LV)), LV)
        model = X2FusionDecMil2(cfg)
        args = (vis, vm, q, qm, qg, syb, sm, sg)
        params = model.init(jax.random.key(0), *args)
        lc, lv_, ls_, atts = model.apply(params, *args)
        for o in (lc, lv_, ls_):
            check(o, cfg)
        assert len(atts) == 1  # last block only
        assert atts[0].shape == (B, cfg.num_heads, LV, LS)


class TestRelattVariant:
    def test_x2_fusion_dec_relatt(self, cfg, rng):
        from structured_alignment_vqa_tpu.models.variants import X2FusionDecRelatt

        vis, _, q, qm1, qg, syb, sm1, sg = make_inputs(cfg, rng)
        n_nodes = LS  # vis-symbolic node sequence length
        vis_syb_ipt = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, (B, n_nodes)), jnp.int32)
        vis_syb_mask = square(jnp.ones((B, n_nodes)), n_nodes)
        vis_syb_graph = jnp.asarray((rng.random((B, n_nodes, n_nodes)) > 0.5).astype(np.float32))
        # object nodes at even rows mapped to regions 0..:
        link = np.full((B, n_nodes), -1, np.int64)
        for i in range(B):
            for r in range(min(LV, n_nodes // 2)):
                link[i, 2 * r] = r
        link = jnp.asarray(link, jnp.int32)
        qm = square(qm1, LQ)
        sm = square(sm1, LS)

        # vis-branch PE table is sized `maxlen` and indexed up to
        # n_nodes + lq (reference assumption: maxlen covers the sum)
        cfg = cfg.replace(maxlen=n_nodes + LQ + 4)
        model = X2FusionDecRelatt(cfg)
        args = (vis, vis_syb_ipt, vis_syb_mask, link, vis_syb_graph,
                q, qm, qg, syb, sm, sg)
        params = model.init(jax.random.key(0), *args)
        lc, lv_, ls_ = model.apply(params, *args)
        for o in (lc, lv_, ls_):
            check(o, cfg)

        # the substitution must matter: different vis features -> different logits
        vis2 = vis + 1.0
        lc2, *_ = model.apply(params, vis2, *args[1:])
        assert not np.allclose(np.asarray(lc), np.asarray(lc2))
        # visGraph off -> fully-connected modality block changes outputs
        lc3, *_ = model.apply(params, *args, vis_graph_enabled=False)
        assert not np.allclose(np.asarray(lc), np.asarray(lc3))

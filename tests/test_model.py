"""Model-level tests: staged-graph construction, MIL-NCE parity against a
full-bilinear sequential oracle, and end-to-end forward properties."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.models import AttModelX3, MILNCEModule, build_stage_graphs
from structured_alignment_vqa_tpu.models.config import tiny_test_config


def np_relu(x):
    return np.maximum(x, 0.0)


class TestBuildStageGraphs:
    def test_matches_torch_blockdiag_loop(self, rng):
        b, lm, lq = 3, 5, 4
        nm = np.array([3, 5, 1])
        nq = np.array([2, 4, 3])
        mm = np.zeros((b, lm, lm), np.float32)
        qm = np.zeros((b, lq, lq), np.float32)
        for i in range(b):
            mm[i, : nm[i], : nm[i]] = 1
            qm[i, : nq[i], : nq[i]] = 1
        qg = (rng.random((b, lq, lq)) > 0.5).astype(np.float32)
        mg = (rng.random((b, lm, lm)) > 0.5).astype(np.float32)

        gd, gc, g, dm = build_stage_graphs(
            jnp.asarray(mm), jnp.asarray(qm), jnp.asarray(qg), jnp.asarray(mg),
            use_dec_mask=True,
        )

        size = lm + lq
        want_mask = np.zeros((b, size, size), np.float32)
        want_gd = np.zeros((b, size, size), np.float32)
        want_dm = np.zeros((b, 1, size), np.float32)
        for i in range(b):
            want_mask[i] = torch.block_diag(torch.from_numpy(mm[i]), torch.from_numpy(qm[i])).numpy()
            want_gd[i, -lq:, -lq:] = qm[i]
            rows = want_mask[i].sum(axis=1)
            rows[rows.nonzero()] = 1
            want_dm[i, 0] = rows
        want_g = 1 - want_mask
        want_g[:, :lm, :lm] = mg
        want_g[:, lm:, lm:] = qg

        np.testing.assert_allclose(np.asarray(gd), want_gd)
        np.testing.assert_allclose(np.asarray(g), want_g)
        # reference aliasing: cross-stage graph IS the final graph
        np.testing.assert_allclose(np.asarray(gc), want_g)
        np.testing.assert_allclose(np.asarray(dm), want_dm)

    def test_distinct_cross_stage_option(self, rng):
        b, lm, lq = 2, 3, 2
        mm = np.zeros((b, lm, lm), np.float32); mm[:, :2, :2] = 1
        qm = np.ones((b, lq, lq), np.float32)
        qg = np.ones((b, lq, lq), np.float32)
        _, gc, g, _ = build_stage_graphs(
            jnp.asarray(mm), jnp.asarray(qm), jnp.asarray(qg), None,
            use_dec_mask=False, distinct_cross_stage=True,
        )
        # pristine cross graph: complement of the block-diagonal mask
        want_mask = np.zeros((b, 5, 5), np.float32)
        want_mask[:, :2, :2] = 1
        want_mask[:, 3:, 3:] = 1
        np.testing.assert_allclose(np.asarray(gc), 1 - want_mask)
        assert not np.allclose(np.asarray(gc), np.asarray(g))


def mil_oracle(params, batch, cfg):
    """Reference MIL_NCE semantics in numpy: full bilinear tensor, gathered
    scores, sequential zero-then-accumulate rewrite (`AttModel_x3.py:338-443`)."""
    p = params["params"]["mil_nce"]
    glove = np.asarray(p["syb_emb"]["table"])
    Wm, bm = np.asarray(p["marco_mlp"]["kernel"]), np.asarray(p["marco_mlp"]["bias"])
    Ws, bs = np.asarray(p["syb_mlp"]["kernel"]), np.asarray(p["syb_mlp"]["bias"])
    Wv, bv = np.asarray(p["vis_mlp"]["kernel"]), np.asarray(p["vis_mlp"]["bias"])
    Wi, bi = np.asarray(p["ipt_mlp"]["kernel"]), np.asarray(p["ipt_mlp"]["bias"])
    R = np.asarray(p["R"]) if "R" in p else None
    eps = 1e-6

    macro_ipt = np.asarray(batch.macro_ipt)
    vis = np.asarray(batch.vis_fea)
    b_sz, ls = macro_ipt.shape

    new_macro = np_relu(glove[macro_ipt] @ Wm + bm)
    pos_fea = np_relu(glove[np.asarray(batch.micro_pos_obj)] @ Ws + bs)
    neg_fea = np_relu(glove[np.asarray(batch.micro_neg_obj)] @ Ws + bs)
    vis_emb = np_relu(vis @ Wv + bv)

    pos_scores = np.einsum("both,boh->bot", pos_fea, vis_emb)
    neg_scores = np.einsum("both,boh->bot", neg_fea, vis_emb)
    mask = np.asarray(batch.micro_obj_mask).astype(np.float32)

    pos_t = torch.from_numpy((pos_scores * mask)[..., None]).clamp(min=eps)
    neg_t = torch.from_numpy((neg_scores * mask)[..., None]).clamp(min=eps)
    zeros = torch.zeros_like(neg_t).clamp(min=eps)
    num = torch.logsumexp(torch.cat([pos_t, zeros], dim=1), dim=2)
    den = torch.logsumexp(torch.cat([pos_t, neg_t], dim=1), dim=2)
    mil_obj = float((num - den).mean())

    w = torch.softmax(torch.from_numpy(pos_scores), dim=2).numpy()
    new_obj = np.sum(w[..., None] * pos_fea, axis=2)

    loc = np.asarray(batch.macro_obj_loc)
    for b in range(b_sz):
        for o in range(loc.shape[1]):
            if loc[b, o] >= 0:
                new_macro[b, loc[b, o]] = new_obj[b, o]

    mil_rel = 0.0
    if not cfg.only_obj:
        rel_fea = np_relu(glove[np.asarray(batch.micro_pos_rel)] @ Ws + bs)
        # full bilinear tensor, as the reference materializes it
        M = np.einsum("bih,rhg,bjg->brij", new_obj, R, new_obj)
        ploc = np.asarray(batch.micro_pos_rel_loc)
        nloc = np.asarray(batch.micro_neg_rel_loc)
        pos_list, neg_list, pos_entries = [], [], []
        for b in range(b_sz):
            for k in range(ploc.shape[1]):
                if ploc[b, k, 3] >= 0:
                    pos_list.append(M[b, ploc[b, k, 2], ploc[b, k, 0], ploc[b, k, 1]])
                    pos_entries.append((b, k))
                if nloc[b, k, 3] >= 0:
                    neg_list.append(M[b, nloc[b, k, 2], nloc[b, k, 0], nloc[b, k, 1]])
        pos_v = torch.tensor(pos_list, dtype=torch.float64).clamp(min=eps)
        neg_v = torch.tensor(neg_list, dtype=torch.float64).clamp(min=eps)
        mil_rel = float(torch.logsumexp(pos_v, 0) - torch.logsumexp(torch.cat([pos_v, neg_v]), 0))

        for (b, k) in pos_entries:
            new_macro[b, ploc[b, k, 3]] = 0.0
        sm = torch.softmax(pos_v, dim=0).numpy()
        for (b, k) in pos_entries:
            micro = ploc[b, k, 4]
            new_macro[b, ploc[b, k, 3]] += sm[micro] * rel_fea[b, micro]

    out = np_relu(new_macro @ Wi + bi)
    return out, mil_obj, mil_rel


@pytest.mark.parametrize("only_obj", [True, False])
def test_mil_nce_matches_sequential_oracle(only_obj):
    cfg = tiny_test_config(only_obj=only_obj)
    batch = synthetic_batch(cfg, batch=3, lv=4, lq=5, ls=10, n_rel=4, seed=3)
    model = MILNCEModule(cfg, name="mil_nce")
    params = model.init(
        jax.random.key(1),
        batch.vis_fea, batch.macro_ipt, batch.macro_obj_loc,
        batch.micro_pos_obj, batch.micro_neg_obj, batch.micro_obj_mask,
        batch.micro_pos_rel, batch.micro_neg_rel,
        batch.micro_pos_rel_loc, batch.micro_neg_rel_loc,
    )
    # wrap so the oracle sees the same param tree path ("mil_nce/...")
    wrapped = {"params": {"mil_nce": params["params"]}}
    out, mil_obj, mil_rel = model.apply(
        params,
        batch.vis_fea, batch.macro_ipt, batch.macro_obj_loc,
        batch.micro_pos_obj, batch.micro_neg_obj, batch.micro_obj_mask,
        batch.micro_pos_rel, batch.micro_neg_rel,
        batch.micro_pos_rel_loc, batch.micro_neg_rel_loc,
    )
    want_out, want_obj, want_rel = mil_oracle(wrapped, batch, cfg)
    np.testing.assert_allclose(np.asarray(out), want_out, atol=2e-4)
    assert abs(float(mil_obj) - want_obj) < 1e-4
    if not only_obj:
        assert abs(float(mil_rel) - want_rel) < 1e-4


class TestAttModelX3:
    def test_forward_shapes_and_finite(self):
        cfg = tiny_test_config()
        batch = synthetic_batch(cfg, batch=3, lv=4, lq=5, ls=10)
        model = AttModelX3(cfg)
        params = model.init(jax.random.key(0), batch)
        lc, lv, lsb, mo, mr = model.apply(params, batch)
        assert lc.shape == lv.shape == lsb.shape == (3, cfg.num_classes)
        for x in (lc, lv, lsb, mo, mr):
            assert np.isfinite(np.asarray(x)).all()

    def test_mcb_variant(self):
        cfg = tiny_test_config(use_mcb=True)
        batch = synthetic_batch(cfg, batch=3, lv=4, lq=5, ls=10)
        model = AttModelX3(cfg)
        variables = model.init(jax.random.key(0), batch)
        assert "constants" in variables  # frozen sketches
        lc, *_ = model.apply(variables, batch)
        assert lc.shape == (3, cfg.num_classes)
        assert np.isfinite(np.asarray(lc)).all()

    def test_dropout_rng_changes_output(self):
        cfg = tiny_test_config(dropout_rate=0.5)
        batch = synthetic_batch(cfg, batch=2, lv=3, lq=4, ls=8)
        model = AttModelX3(cfg)
        params = model.init(jax.random.key(0), batch)
        a, *_ = model.apply(params, batch, deterministic=False, rngs={"dropout": jax.random.key(1)})
        b, *_ = model.apply(params, batch, deterministic=False, rngs={"dropout": jax.random.key(2)})
        c, *_ = model.apply(params, batch, deterministic=True)
        assert not np.allclose(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(c)).all()

    def test_macro_mlp_detached(self):
        """`detach()` at AttModel_x3.py:354: the macro embedding MLP must get
        zero gradient from every output except through nothing at all."""
        cfg = tiny_test_config()
        batch = synthetic_batch(cfg, batch=2, lv=3, lq=4, ls=8)
        model = AttModelX3(cfg)
        params = model.init(jax.random.key(0), batch)

        def loss(p):
            lc, lv, lsb, mo, mr = model.apply(p, batch)
            return jnp.sum(lc) + jnp.sum(lv) + jnp.sum(lsb) - mo - mr

        grads = jax.grad(loss)(params)
        g = grads["params"]["mil_nce"]["marco_mlp"]["kernel"]
        np.testing.assert_allclose(np.asarray(g), 0.0)
        # but the rewrite path (syb_mlp) must receive gradient
        g2 = grads["params"]["mil_nce"]["syb_mlp"]["kernel"]
        assert np.abs(np.asarray(g2)).max() > 0

    def test_share_glove_single_table(self):
        cfg = tiny_test_config(share_glove=True)
        batch = synthetic_batch(cfg, batch=2, lv=3, lq=4, ls=8)
        model = AttModelX3(cfg)
        params = model.init(jax.random.key(0), batch)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        # GloVeEmbed params are named exactly "table" (the PE embeddings use
        # "lookup_table"); sharing must leave exactly one GloVe copy.
        tables = [p for p, _ in flat if getattr(p[-1], "key", None) == "table"]
        assert len(tables) == 1

        cfg2 = tiny_test_config(share_glove=False)
        model2 = AttModelX3(cfg2)
        batch2 = synthetic_batch(cfg2, batch=2, lv=3, lq=4, ls=8)
        params2 = model2.init(jax.random.key(0), batch2)
        flat2 = jax.tree_util.tree_flatten_with_path(params2)[0]
        tables2 = [p for p, _ in flat2 if getattr(p[-1], "key", None) == "table"]
        assert len(tables2) == 3  # reference layout: one per consumer

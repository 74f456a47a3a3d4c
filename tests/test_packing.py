"""Sequence packing: packed rows must reproduce unpacked per-sample outputs.

The isolation argument (docs/DESIGN.md): every stage graph is multiplied by
the segment-equality matrix, and the graph-guided attention renormalizes after
the graph multiply, so the softmax normalizer cancels and cross-segment keys
contribute exactly nothing. Positions restart per segment, so learned PEs see
identical ids. Hence packing two samples into one row of the same bucket
shape is *numerically equivalent* (up to fp rounding in the renorm division)
to giving each its own row.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.dataset import BatchShape, Sample, collate
from structured_alignment_vqa_tpu.data.packing import PackedRow, collate_packed
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import tiny_test_config

TOPN = 2
FEA_DIM = 16


def mk_sample(rng, no, nm, nq, answer, vocab=401000):
    """A structurally-valid Sample with random content."""
    ids = lambda n: rng.integers(1, 40, size=n).astype(np.int64)
    edges = lambda n, k: [tuple(map(int, rng.integers(0, n, 2))) for _ in range(k)]
    locs = np.sort(rng.choice(nm, size=min(no, nm), replace=False)).astype(np.int64)
    return Sample(
        vis_fea=rng.standard_normal((no, FEA_DIM)).astype(np.float32),
        macro_ids=ids(nm),
        macro_edges=edges(nm, 2 * nm),
        obj_locs=locs,
        micro_pos_obj=rng.integers(1, 40, size=(no, TOPN)).astype(np.int64),
        micro_neg_obj=rng.integers(1, 40, size=(no, TOPN)).astype(np.int64),
        q_ids=ids(nq),
        q_edges=edges(nq, nq),
        answer=answer,
    )


@pytest.fixture
def cfg():
    return tiny_test_config(
        vocab_size=401000, glove_dim=8, vis_fea_dim=FEA_DIM,
        maxlen=64, maxlen_q=12, maxlen_v=8, num_classes=7,
    )


def to_jax(batch):
    return jax.tree.map(jnp.asarray, batch)


class TestPackedEquivalence:
    def test_packed_equals_tight_unpacked(self, rng, cfg):
        """Packed rows implement tight-bucket semantics: each packed
        sub-sample's logits equal the sample collated ALONE with zero padding
        (bucket == its own lengths).

        Unpacked padded rows are NOT the comparison target: the reference's
        `1 - mask` cross stage attends PAD-embedding padding tokens
        (`AttModel_x3.py:118-122`), so padded outputs depend on the bucket
        size; packing removes exactly that artifact.
        """
        shape = BatchShape(lv=8, ls=20, lq=12)
        samples = [
            mk_sample(rng, no=3, nm=8, nq=5, answer=3),
            mk_sample(rng, no=4, nm=9, nq=6, answer=1),
        ]
        packed = to_jax(collate_packed([samples], shape, TOPN, n_pack=2, fea_dim=FEA_DIM))

        model = AttModelX3(cfg)
        params = jax.jit(model.init)(jax.random.key(0), packed)
        # move LN params off the content-mask knife edge (docs/PARITY.md)
        params = jax.tree.map(
            lambda l: l + 0.03 * jax.random.normal(jax.random.key(1), l.shape, l.dtype),
            params,
        )

        lc_p, lv_p, ls_p, mil_p, _ = model.apply(params, packed, deterministic=True)
        assert lc_p.shape == (1, 2, cfg.num_classes)

        mil_sum_tight = 0.0
        for k, s in enumerate(samples):
            tight_shape = BatchShape(
                lv=s.vis_fea.shape[0], ls=len(s.macro_ids), lq=len(s.q_ids)
            )
            tight = to_jax(collate([s], tight_shape, TOPN, fea_dim=FEA_DIM))
            lc_t, lv_t, ls_t, mil_t, _ = model.apply(params, tight, deterministic=True)
            for got, want in ((lc_p, lc_t), (lv_p, lv_t), (ls_p, ls_t)):
                np.testing.assert_allclose(
                    np.asarray(got[0, k]), np.asarray(want[0]), atol=2e-4, rtol=1e-4
                )
            mil_sum_tight += float(mil_t) * 2 * tight_shape.lv
        # The MIL-NCE mean runs over all object slots (padded ones contribute
        # exactly zero), so the *sums* must agree across layouts.
        np.testing.assert_allclose(
            float(mil_p) * 2 * shape.lv, mil_sum_tight, rtol=1e-5, atol=1e-6
        )

    def test_content_swap_isolation(self, rng, cfg):
        """Changing sample B's content must not change sample A's packed
        logits at all (bitwise isolation of segments)."""
        shape = BatchShape(lv=8, ls=20, lq=12)
        s1 = mk_sample(rng, no=3, nm=8, nq=5, answer=3)
        s2 = mk_sample(rng, no=4, nm=9, nq=6, answer=1)
        s2b = mk_sample(rng, no=4, nm=9, nq=6, answer=2)

        a = to_jax(collate_packed([[s1, s2]], shape, TOPN, n_pack=2, fea_dim=FEA_DIM))
        b = to_jax(collate_packed([[s1, s2b]], shape, TOPN, n_pack=2, fea_dim=FEA_DIM))

        model = AttModelX3(cfg)
        params = jax.jit(model.init)(jax.random.key(0), a)
        params = jax.tree.map(
            lambda l: l + 0.03 * jax.random.normal(jax.random.key(1), l.shape, l.dtype),
            params,
        )
        la = model.apply(params, a, deterministic=True)
        lb = model.apply(params, b, deterministic=True)
        for ga, gb in zip(la[:3], lb[:3]):
            np.testing.assert_allclose(
                np.asarray(ga[0, 0]), np.asarray(gb[0, 0]), atol=2e-5
            )
            # and sample B's logits DID change (the swap was real)
            assert not np.allclose(np.asarray(ga[0, 1]), np.asarray(gb[0, 1]), atol=1e-3)

    def test_packed_train_step(self, rng, cfg):
        """make_train_step runs on packed batches: (B, K) answers/validity
        flow through the loss, metrics count pack slots, params update."""
        from structured_alignment_vqa_tpu.parallel.train_step import (
            TrainState, adam, make_train_step,
        )

        shape = BatchShape(lv=8, ls=20, lq=12)
        groups = [
            [mk_sample(rng, 3, 8, 5, 3), mk_sample(rng, 2, 6, 4, 1)],
            [mk_sample(rng, 4, 9, 6, 2)],
        ]
        batch = to_jax(collate_packed(groups, shape, TOPN, n_pack=2, fea_dim=FEA_DIM))

        model = AttModelX3(cfg)
        variables = model.init(jax.random.key(0), batch)
        tx = adam(1e-3)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            constants=dict(variables.get("constants", {})),
        )
        step = make_train_step(model, tx, cfg, with_milnce=True)
        new_state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["n"]) == 3.0  # three valid pack slots
        assert int(new_state.step) == 1


class TestPackedRowPlanner:
    def test_first_fit(self, rng):
        shape = BatchShape(lv=8, ls=20, lq=12)
        row = PackedRow(shape, n_pack=2)
        s1 = mk_sample(rng, 3, 8, 5, 0)
        s2 = mk_sample(rng, 4, 9, 6, 0)
        s3 = mk_sample(rng, 2, 4, 3, 0)
        assert row.fits(s1)
        row.add(s1)
        assert row.fits(s2)
        row.add(s2)
        assert not row.fits(s3)  # n_pack exhausted
        big = mk_sample(rng, 8, 20, 12, 0)
        row2 = PackedRow(shape, n_pack=4)
        row2.add(big)
        assert not row2.fits(s3)  # capacity exhausted

    def test_loader_packs(self, rng, tmp_path):
        """End-to-end: the BatchLoader with n_pack=2 yields packed batches
        carrying every sample exactly once, in fewer rows."""
        from structured_alignment_vqa_tpu.data.dataset import (
            BatchLoader, DataConfig, GQASuperNodeDataset,
        )
        from structured_alignment_vqa_tpu.data.fixtures import write_fixture

        d = tmp_path / "data"
        write_fixture(str(d), n_images=6, n_questions=24, seed=3)
        cfg = DataConfig(data_dir=str(d), maxlen=128, topn=2)
        ds = GQASuperNodeDataset("train", cfg)
        buckets = [BatchShape(16, 48, 16)]

        def count_valid(loader):
            n = 0
            rows = 0
            for b in loader:
                n += int(np.sum(np.asarray(b.sample_valid)))
                rows += b.vis_fea.shape[0]
            return n, rows

        plain = BatchLoader(ds, 4, buckets=buckets, shuffle=False,
                            drop_last=False, num_threads=2)
        packed = BatchLoader(ds, 4, buckets=buckets, shuffle=False,
                             drop_last=False, num_threads=2, n_pack=3)
        n_plain, rows_plain = count_valid(plain)
        n_packed, rows_packed = count_valid(packed)
        assert n_packed == n_plain  # nothing lost or duplicated
        assert rows_packed < rows_plain  # packing actually packs
        for b in packed:
            assert b.vis_seg is not None
            assert b.answer.ndim == 2
            break

    def test_pack_bucket_routing(self, rng, tmp_path):
        """With multiple buckets, packed samples route to the pack bucket
        (default: largest) instead of the smallest fitting one — at the
        production length mix smallest-fit rows hold only one sample, so
        routing is where the fill gain comes from (docs/DESIGN.md)."""
        from structured_alignment_vqa_tpu.data.dataset import (
            BatchLoader, DataConfig, GQASuperNodeDataset,
        )
        from structured_alignment_vqa_tpu.data.fixtures import write_fixture

        d = tmp_path / "data"
        write_fixture(str(d), n_images=6, n_questions=24, seed=3)
        cfg = DataConfig(data_dir=str(d), maxlen=128, topn=2)
        ds = GQASuperNodeDataset("train", cfg)
        # every sample fits the small bucket alone; only the big one pairs
        buckets = [BatchShape(16, 48, 16), BatchShape(32, 96, 32)]

        packed = BatchLoader(ds, 4, buckets=buckets, shuffle=False,
                             drop_last=False, num_threads=2, n_pack=3)
        assert packed.pack_bucket == sorted(buckets)[-1]
        shapes = set()
        n_valid = 0
        multi = 0
        for b in packed:
            shapes.add(b.macro_ipt.shape[1])
            per_row = np.sum(np.asarray(b.sample_valid), axis=1)
            multi += int(np.sum(per_row > 1))
            n_valid += int(per_row.sum())
        assert shapes == {96}  # everything went to the pack bucket
        assert multi > 0  # and rows actually pair up there
        plain = BatchLoader(ds, 4, buckets=buckets, shuffle=False,
                            drop_last=False, num_threads=2)
        n_plain = sum(int(np.sum(np.asarray(b.sample_valid))) for b in plain)
        assert n_valid == n_plain

    def test_tight_eval_loader_matches_packed_semantics(self, rng, tmp_path):
        """tight=True with n_pack=1 (the eval side of packed training) must
        encode each sample exactly like its packed-row incarnation: model
        logits per sample agree between a tight one-per-row loader and an
        n_pack=3 packed loader over the same data (ADVICE r2: no train/eval
        encoding skew)."""
        import jax
        from structured_alignment_vqa_tpu.data.dataset import (
            BatchLoader, BatchShape, DataConfig, GQASuperNodeDataset,
        )
        from structured_alignment_vqa_tpu.data.fixtures import write_fixture
        from structured_alignment_vqa_tpu.models import AttModelX3
        from structured_alignment_vqa_tpu.models.config import tiny_test_config

        d = tmp_path / "data"
        write_fixture(str(d), n_images=6, n_questions=12, seed=5)
        dcfg = DataConfig(data_dir=str(d), maxlen=128, topn=2)
        ds = GQASuperNodeDataset("train", dcfg)
        buckets = [BatchShape(16, 48, 16)]

        mcfg = tiny_test_config(
            num_classes=len(ds.ans_w2id) + 1, vocab_size=407000, vis_fea_dim=2048,
            topn=2, maxlen_v=16, maxlen=48, maxlen_q=16,
        )
        model = AttModelX3(mcfg)

        params = {}

        def logits_by_fingerprint(loader):
            # no sample id in the batch: key each slot by its question +
            # macro token content plus the answer (unique in this fixture)
            out = {}
            for b in loader:
                if "p" not in params:
                    p = model.init(jax.random.key(0), b)
                    # off the content-mask knife edge (docs/PARITY.md)
                    params["p"] = jax.tree.map(
                        lambda l: l + 0.03 * jax.random.normal(
                            jax.random.key(1), l.shape, l.dtype), p)
                lc, _, _, _, _ = model.apply(params["p"], b, deterministic=True)
                lc = np.asarray(lc)
                valid = np.asarray(b.sample_valid)
                q_ipt, q_seg = np.asarray(b.q_ipt), np.asarray(b.q_seg)
                m_ipt, m_seg = np.asarray(b.macro_ipt), np.asarray(b.macro_seg)
                ans = np.asarray(b.answer)
                for i in range(valid.shape[0]):
                    for j in range(valid.shape[1]):
                        if valid[i, j]:
                            key = (
                                tuple(q_ipt[i][q_seg[i] == j]),
                                tuple(m_ipt[i][m_seg[i] == j]),
                                int(ans[i, j]),
                            )
                            vkey = round(float(
                                np.asarray(b.vis_fea)[i][
                                    np.asarray(b.vis_seg)[i] == j
                                ].sum()), 2)
                            key = key + (vkey,)
                            if key in out:
                                # true duplicate sample: logits must agree
                                np.testing.assert_allclose(
                                    out[key], lc[i, j], atol=1e-5)
                            out[key] = lc[i, j]
            return out

        tight = BatchLoader(ds, 4, buckets=buckets, shuffle=False,
                            drop_last=False, num_threads=2, tight=True)
        packed = BatchLoader(ds, 4, buckets=buckets, shuffle=False,
                             drop_last=False, num_threads=2, n_pack=3)
        a = logits_by_fingerprint(tight)
        b = logits_by_fingerprint(packed)
        assert set(a) == set(b) and len(a) > 0
        for qid in a:
            np.testing.assert_allclose(a[qid], b[qid], atol=1e-5, err_msg=str(qid))

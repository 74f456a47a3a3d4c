"""Data-layer tests: tar indexing, graph construction, tokenization, collate,
and the full pipeline feeding the model — all against on-disk fixtures in the
reference's raw format."""

import json
import os

import numpy as np
import pytest
import jax

from structured_alignment_vqa_tpu.data.dataset import (
    BatchLoader,
    BatchShape,
    DataConfig,
    GQASuperNodeDataset,
    collate,
)
from structured_alignment_vqa_tpu.data.fixtures import write_fixture, OBJECTS, ATTRS, RELATIONS
from structured_alignment_vqa_tpu.data.graph_builder import (
    PAD_NODE,
    SuperNodeGraphBuilder,
    quantize_bbox,
)
from structured_alignment_vqa_tpu.data.tar_reader import TarIndex, TarMemberList
from structured_alignment_vqa_tpu.models.glove import SPECIALS


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gqa_fixture"))
    write_fixture(root, n_images=10, n_questions=40, seed=0)
    return root


@pytest.fixture(scope="module")
def data_cfg(fixture_dir):
    return DataConfig(data_dir=fixture_dir, q_tar="train.tar", maxlen=200, topn=2, min_cnt=50)


class TestTarIndex:
    def test_index_and_read(self, fixture_dir):
        idx = TarIndex(os.path.join(fixture_dir, "gt_bua_npz.tar"))
        assert len(idx) == 10
        assert "img0000" in idx
        npz = idx.read_npz("img0003", allow_pickle=True)
        assert npz["x"].shape[1] == 2048
        assert npz["bbox"].shape[1] == 4

    def test_member_list_order(self, fixture_dir):
        idx = TarIndex(os.path.join(fixture_dir, "train.tar"))
        lst = TarMemberList(idx, ".json")
        assert len(lst) == 40
        q0 = lst.read_json(0)
        assert {"node_list", "edge_pair", "answer", "image_id"} <= set(q0)

    def test_matches_tarfile_extraction(self, fixture_dir):
        import tarfile as tf

        path = os.path.join(fixture_dir, "train.tar")
        idx = TarIndex(path)
        with tf.open(path) as t:
            m = t.getmembers()[5]
            want = t.extractfile(m).read()
        got = idx.read_by_name(m.name)
        assert got == want


class TestQuantizeBbox:
    def test_binning(self):
        bbox = np.array([[0.0, 0.0, 320.0, 240.0]], np.float32)
        out = quantize_bbox(bbox, 640, 480, 64)
        np.testing.assert_array_equal(out, [[0, 0, 32, 32]])

    def test_1d_bbox_reshaped(self):
        out = quantize_bbox(np.array([64.0, 48.0, 640.0, 480.0]), 640, 480, 64)
        assert out.shape == (1, 4)
        np.testing.assert_array_equal(out, [[6, 6, 64, 64]])


class TestGraphBuilder:
    def build(self, only_obj=True, with_loc=True, topn=2):
        return SuperNodeGraphBuilder(
            OBJECTS, ATTRS, RELATIONS, topn=topn, with_loc=with_loc, only_obj=only_obj
        )

    def example(self):
        # two objects: man (detected as man -> correct), car
        data_info = {
            "objects_id": [[0, 2, 1], [1, 3]],  # man det: man,dog,car ; car det: car,tree
            "attrs_id": [0, 1],
        }
        gt_graph = {"objects": {"a": {"name": "man"}, "b": {"name": "car"}}}
        bbox = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], np.int32)
        return data_info, bbox, gt_graph

    def test_skeleton_and_candidates(self):
        b = self.build()
        g = b.convert(*self.example(), rng=np.random.default_rng(0))
        # super nodes at rows 0 and (1 obj + 1 attr + 2 pos nodes) = 4... find via obj_locs
        assert len(g.obj_locs) == 2
        assert g.nodes[g.obj_locs[0]] is PAD_NODE
        assert g.nodes[g.obj_locs[1]] is PAD_NODE
        # candidates: GT first, then non-duplicate detections up to topN
        assert g.micro_pos_obj[0] == ["man", "dog"]
        assert g.micro_pos_obj[1] == ["car", "tree"]
        # negatives exclude positives
        for pos, neg in zip(g.micro_pos_obj, g.micro_neg_obj):
            assert not (set(pos) & set(neg))
            assert len(neg) == 2
        # attr nodes linked both directions
        attr_rows = [i for i, n in enumerate(g.nodes) if n in ("red", "small")]
        for ar in attr_rows:
            assert any(e == (g.obj_locs[0], ar) or e == (g.obj_locs[1], ar) for e in g.edges)

    def test_position_nodes_shared(self):
        b = self.build()
        data_info, _, gt_graph = self.example()
        bbox = np.array([[1, 2, 3, 4], [1, 2, 3, 4]], np.int32)  # same corners
        g = b.convert(data_info, bbox, gt_graph, rng=np.random.default_rng(0))
        pos_nodes = [n for n in g.nodes if isinstance(n, str) and n.startswith("x")]
        assert pos_nodes == ["x1y2", "x3y4"]  # deduplicated

    def test_top1_relation_with_spatial_correction(self):
        b = self.build()
        data_info, bbox, gt_graph = self.example()
        # man,car -> "to the left of"; bbox centers: obj0 left of obj1 -> stays "left"?
        g = b.convert(data_info, bbox, gt_graph, rng=np.random.default_rng(0))
        rel_nodes = [n for n in g.nodes if n in ("totheleftof", "right", "left")]
        # name 'totheleftof' contains 'left'; obj0 x-sum=4 < obj1 x-sum=12 -> no flip,
        # but the correction rewrites to 'left' only if flipped... name kept otherwise
        assert "totheleftof" in rel_nodes
        # flip case: swap bboxes so obj0 is right of obj1
        bbox2 = np.array([[5, 6, 7, 8], [1, 2, 3, 4]], np.int32)
        g2 = b.convert(data_info, bbox2, gt_graph, rng=np.random.default_rng(0))
        assert "right" in g2.nodes

    def test_full_variant_rel_records(self):
        b = self.build(only_obj=False)
        g = b.convert(*self.example(), rng=np.random.default_rng(0))
        # __empty__ node per ordered pair
        assert g.nodes.count("__empty__") == 2
        # 2 objects x topN(2)^2 candidate pairs = 4 records per ordered pair
        assert len(g.micro_pos_rel_loc) == 8
        for rec in g.micro_pos_rel_loc:
            assert len(rec) == 5
            i, j, cat, macro_loc, micro_loc = rec
            assert g.nodes[macro_loc] == "__empty__"
        # micro_loc is the global enumeration index
        assert [r[4] for r in g.micro_pos_rel_loc] == list(range(8))
        # negatives per pair: min(#positives, #unused relation categories).
        # Pair (0,1) has positive cats {0, 1, PAD} leaving a pool of 3 < 4
        # positives (the reference's random.sample would raise here and drop
        # the sample); pair (1,0) has a full pool of 5 -> 4 negatives. 3+4=7.
        assert len(g.micro_neg_rel_loc) == 7
        for i, j, cat, macro_loc, _ in g.micro_neg_rel_loc:
            pos_cats = {r[2] for r in g.micro_pos_rel_loc if (r[0], r[1]) == (i, j)}
            assert cat not in pos_cats
            assert g.nodes[macro_loc] == "__empty__"


class TestDataset:
    def test_samples_load(self, data_cfg):
        ds = GQASuperNodeDataset("train", data_cfg)
        assert len(ds) == 40
        n_ok = 0
        for i in range(len(ds)):
            s = ds.sample(i)
            if s is None:
                continue
            n_ok += 1
            assert s.vis_fea.shape[1] == 2048
            assert s.micro_pos_obj.shape == (s.vis_fea.shape[0], data_cfg.topn)
            assert (s.macro_ids[np.asarray(s.obj_locs)] == SPECIALS.PAD).all()
            # answers: ANSWERS + OBJECTS (ids from 1; 0 = out-of-vocab)
            assert 0 <= s.answer <= 12
        assert n_ok >= 30  # most fixture samples are well-formed

    def test_deterministic_sampling(self, data_cfg):
        ds = GQASuperNodeDataset("train", data_cfg)
        a, b = ds.sample(3), ds.sample(3)
        np.testing.assert_array_equal(a.micro_neg_obj, b.micro_neg_obj)

    def test_answer_vocab_min_cnt(self, data_cfg):
        ds = GQASuperNodeDataset("train", data_cfg)
        assert "rare_answer" not in ds.ans_w2id
        # ANSWERS (5) + OBJECTS (8) minus the "man" overlap = 12
        assert len(ds.ans_w2id) == 12

    def test_collate_shapes_and_masks(self, data_cfg):
        ds = GQASuperNodeDataset("train", data_cfg)
        samples = [ds.sample(i) for i in range(8)]
        shape = BatchShape(lv=8, ls=64, lq=12, n_rel=0)
        batch = collate(samples, shape, topn=data_cfg.topn)
        assert batch.vis_fea.shape == (8, 8, 2048)
        assert batch.macro_ipt.shape == (8, 64)
        v = np.asarray(batch.sample_valid)
        for i, s in enumerate(samples):
            if s is None or not shape.fits(s):
                assert v[i] == 0
            else:
                assert v[i] == 1
                n = s.vis_fea.shape[0]
                assert np.asarray(batch.vis_mask)[i, :n, :n].all()
                assert not np.asarray(batch.vis_mask)[i, n:, :].any()

    def test_loader_end_to_end_model_forward(self, data_cfg):
        """Full slice: raw tars -> batches -> AttModelX3 forward."""
        import jax.numpy as jnp
        from structured_alignment_vqa_tpu.models import AttModelX3
        from structured_alignment_vqa_tpu.models.config import ModelConfig

        ds = GQASuperNodeDataset("train", data_cfg)
        buckets = [BatchShape(lv=8, ls=64, lq=12, n_rel=0)]
        loader = BatchLoader(ds, batch_size=4, buckets=buckets, shuffle=True, seed=1)
        batches = list(loader)
        assert len(batches) >= 4

        cfg = ModelConfig(
            num_classes=len(ds.ans_w2id) + 1,
            num_relations=len(ds.builder.gt_relation_clean) + 1,
            vocab_size=401000,  # tiny fixture ids are small; PAD=400000 must fit
            hidden_size=16, hidden_size_mil=8, num_blocks=3, num_heads=2,
            dropout_rate=0.0, maxlen=200, maxlen_q=12, maxlen_v=8, topn=2,
            stage1_blocks=1, stage2_blocks=2, glove_dim=8,
        )
        model = AttModelX3(cfg)
        params = model.init(jax.random.key(0), batches[0])
        lc, lv_, ls_, mo, mr = model.apply(params, batches[0])
        assert lc.shape == (4, cfg.num_classes)
        assert np.isfinite(np.asarray(lc)).all()

    def test_process_pool_loader_matches_threads(self, data_cfg):
        """num_procs>0 (spawn workers — fork would clone the trainer's live
        JAX threads' locks) must yield the same batches as the thread pool."""
        ds = GQASuperNodeDataset("train", data_cfg)
        buckets = [BatchShape(lv=8, ls=64, lq=12, n_rel=0)]

        def collect(loader):
            out = []
            for b in loader:
                out.append((int(np.sum(np.asarray(b.sample_valid))),
                            np.asarray(b.macro_ipt).sum()))
            return out

        threads = collect(BatchLoader(ds, 4, buckets=buckets, shuffle=False,
                                      drop_last=False, num_threads=2))
        procs = collect(BatchLoader(ds, 4, buckets=buckets, shuffle=False,
                                    drop_last=False, num_procs=2))
        assert procs == threads

    def test_sharded_loader_partitions(self, data_cfg):
        ds = GQASuperNodeDataset("train", data_cfg)
        idx0 = BatchLoader(ds, 4, shuffle=False, shard_idx=0, num_shards=2)._indices()
        idx1 = BatchLoader(ds, 4, shuffle=False, shard_idx=1, num_shards=2)._indices()
        assert set(idx0) & set(idx1) == set()
        assert len(set(idx0) | set(idx1)) == len(ds)

"""Data-layer ground truth: run the ACTUAL reference loader on the fixture
tars and compare its sample construction with ours, index by index.

Deterministic fields must match exactly: macro node ids, edges, object
locations, topN positive candidates, question tokens, answer ids. Negative
sampling intentionally differs (the reference draws from the global python
RNG; we use an explicit per-sample Generator — docs/PARITY.md).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/models"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from structured_alignment_vqa_tpu.data.fixtures import write_fixture

    root = str(tmp_path_factory.mktemp("refdata"))
    write_fixture(root, n_images=10, n_questions=40, seed=9)
    return root


@pytest.fixture(scope="module")
def ref_dataset(fixture_dir):
    sys.path.insert(0, REF)
    try:
        import data_loader_itp_bbox_super_node_onlyobj as ref_loader

        opt = types.SimpleNamespace(
            data_dir_azure=fixture_dir,
            gt_relation_fn="GT_relations_dict_compsite.json",
            enc_vocab_fn="preprocessed/de.vocab.composite2.tsv",
            ans_vocab_fn="preprocessed/en.vocab.tsv",
            obj_vocab_fn="objects_vocab.txt",
            attr_vocab_fn="attributes_vocab.txt",
            bbox_bin_num=64,
            min_cnt=50,
            maxlen=200,
            bg_class=9,
            pred_rel=True,
        )
        ds = ref_loader.GQADataset_super_node(
            "train", opt, "gt_bua_npz.tar", "train.tar", "gt_bua_npz.tar",
            topN=2, with_loc=True,
        )
        yield ds
    finally:
        sys.path.remove(REF)


@pytest.fixture(scope="module")
def our_dataset(fixture_dir):
    from structured_alignment_vqa_tpu.data.dataset import DataConfig, GQASuperNodeDataset

    cfg = DataConfig(
        data_dir=fixture_dir, q_tar="train.tar", maxlen=200, topn=2,
        min_cnt=50, with_loc=True, only_obj=True, pred_rel=True,
        ragged_candidates="drop",
    )
    return GQASuperNodeDataset("train", cfg)


def test_samples_match_reference(ref_dataset, our_dataset):
    n_compared = 0
    for i in range(len(our_dataset)):
        ref_item = ref_dataset[i]
        ours = our_dataset.sample(i)
        if ref_item is None:
            # the reference's bare except hides several failure classes we
            # repair (see docs/PARITY.md); only require: if the reference
            # kept it, we keep it and match it
            continue
        assert ours is not None, f"sample {i}: reference kept it, we dropped it"
        (vis_fea, macro_idx, obj_locs, macro_edges,
         micro_pos, micro_neg, q_idx, q_edges, answer, topn) = ref_item

        np.testing.assert_array_equal(ours.vis_fea, vis_fea, err_msg=f"vis {i}")
        np.testing.assert_array_equal(ours.macro_ids, macro_idx, err_msg=f"macro {i}")
        np.testing.assert_array_equal(ours.obj_locs, obj_locs, err_msg=f"locs {i}")
        assert [list(e) for e in ours.macro_edges] == [list(e) for e in macro_edges], f"edges {i}"
        np.testing.assert_array_equal(ours.micro_pos_obj, micro_pos, err_msg=f"pos {i}")
        np.testing.assert_array_equal(ours.q_ids, q_idx, err_msg=f"q {i}")
        assert ours.answer == int(answer), f"answer {i}"
        # negatives: same shape/validity, sampling stream differs by design
        assert ours.micro_neg_obj.shape == micro_neg.shape
        n_compared += 1
    assert n_compared >= 10, f"only {n_compared} comparable samples"


def test_collate_matches_reference_on_valid_region(ref_dataset, our_dataset, fixture_dir):
    """The reference collate pads to batch maxima; ours pads to a bucket.
    On the common (unpadded) region every tensor must agree."""
    sys.path.insert(0, REF)
    try:
        import data_loader_itp_bbox_super_node_onlyobj as ref_loader

        idxs = [i for i in range(16) if ref_dataset[i] is not None][:4]
        ref_items = [ref_dataset[i] for i in idxs]
        ref_batch = ref_loader.collate_fn(ref_items)

        from structured_alignment_vqa_tpu.data.dataset import BatchShape, collate

        ours = [our_dataset.sample(i) for i in idxs]
        shape = BatchShape(lv=8, ls=64, lq=12, n_rel=0)
        our_batch = collate(ours, shape, topn=2)

        lv = ref_batch["vis_fea"].shape[1]
        ls = ref_batch["macro_node_ipt"].shape[1]
        lq = ref_batch["q_ipt"].shape[1]
        np.testing.assert_array_equal(
            np.asarray(our_batch.vis_fea)[:, :lv], ref_batch["vis_fea"].numpy())
        np.testing.assert_array_equal(
            np.asarray(our_batch.macro_ipt)[:, :ls], ref_batch["macro_node_ipt"].numpy())
        np.testing.assert_array_equal(
            np.asarray(our_batch.macro_graph)[:, :ls, :ls], ref_batch["macro_graph_ipt"].numpy())
        np.testing.assert_array_equal(
            np.asarray(our_batch.macro_mask)[:, :ls, :ls], ref_batch["macro_node_mask"].numpy())
        np.testing.assert_array_equal(
            np.asarray(our_batch.q_ipt)[:, :lq], ref_batch["q_ipt"].numpy())
        np.testing.assert_array_equal(
            np.asarray(our_batch.q_graph)[:, :lq, :lq], ref_batch["q_ipt_graph"].numpy())
        np.testing.assert_array_equal(
            np.asarray(our_batch.micro_pos_obj)[:, :lv], ref_batch["micro_positive_obj_ipt"].numpy())
        np.testing.assert_array_equal(
            np.asarray(our_batch.micro_obj_mask)[:, :lv], ref_batch["micro_obj_mask"].numpy())
        np.testing.assert_array_equal(
            np.asarray(our_batch.macro_obj_loc)[:, :lv], ref_batch["macro_obj_loc_ipt"].numpy())
        np.testing.assert_array_equal(
            np.asarray(our_batch.answer), ref_batch["answer"].numpy())
        # padding regions beyond the reference extent must be inert
        assert (np.asarray(our_batch.macro_ipt)[:, ls:] == 400000).all()
        assert (np.asarray(our_batch.sample_valid) == 1).all()
    finally:
        sys.path.remove(REF)


def test_gt_loader_matches_reference(fixture_dir):
    """The GT-scene-graph eval loader (`data_loader_itp_gt.py`) vs the
    'itp_gt' preset: node ids (incl. the off-by-one edge quirk and the
    no-synonym-converter tokenization), edges, question tokens, answers."""
    import types

    ref_dl = os.path.join(os.path.dirname(REF), "dataloader")
    sys.path.insert(0, REF)  # synonym_word_converter import
    sys.path.insert(0, ref_dl)
    try:
        import data_loader_itp_gt as ref_gt

        opt = types.SimpleNamespace(
            data_dir_azure=fixture_dir,
            gt_relation_fn="GT_relations_dict_compsite.json",
            enc_vocab_fn="preprocessed/de.vocab.composite2.tsv",
            ans_vocab_fn="preprocessed/en.vocab.tsv",
            obj_vocab_fn="objects_vocab.txt",
            attr_vocab_fn="attributes_vocab.txt",
            min_cnt=50,
        )
        ref = ref_gt.GQADataset(opt, "gt_bua_npz.tar", "train.tar",
                                "train_sceneGraphs.json", with_loc=False)
    finally:
        sys.path.remove(REF)
        sys.path.remove(ref_dl)

    from structured_alignment_vqa_tpu.data.node_graph_dataset import (
        NodeGraphDataset, config_for_variant,
    )

    cfg = config_for_variant("itp_gt", fixture_dir, q_tar="train.tar",
                             maxlen=10_000, min_cnt=50)
    ours = NodeGraphDataset("train", cfg)

    n = 0
    for i in range(len(ours)):
        vis_fea, nodes_idx, edges, q_idx, q_edges, answer = ref[i]
        s = ours.sample(i)
        assert s is not None, i
        np.testing.assert_array_equal(s.vis_fea, vis_fea, err_msg=f"vis {i}")
        np.testing.assert_array_equal(s.node_ids, nodes_idx, err_msg=f"nodes {i}")
        assert [list(e) for e in s.edges] == [list(e) for e in edges], f"edges {i}"
        np.testing.assert_array_equal(s.q_ids, q_idx, err_msg=f"q {i}")
        assert s.answer == int(answer)
        n += 1
    assert n >= 10


def test_gtrelprednode_loader_matches_reference(fixture_dir):
    """`data_loader_itp_GTRelPredNode_bbox.py` (predicted node labels + GT
    relation edges) vs the 'itp_GTRelPredNode_bbox' preset."""
    import types

    ref_dl = os.path.join(os.path.dirname(REF), "dataloader")
    sys.path.insert(0, REF)
    sys.path.insert(0, ref_dl)
    try:
        import data_loader_itp_GTRelPredNode_bbox as ref_mod

        opt = types.SimpleNamespace(
            data_dir_azure=fixture_dir,
            gt_relation_fn="GT_relations_dict_compsite.json",
            enc_vocab_fn="preprocessed/de.vocab.composite2.tsv",
            ans_vocab_fn="preprocessed/en.vocab.tsv",
            obj_vocab_fn="objects_vocab.txt",
            attr_vocab_fn="attributes_vocab.txt",
            bbox_bin_num=64,
            min_cnt=50,
            bg_class=9,
        )
        ref = ref_mod.GQADataset_topN(
            "train", opt, "gt_bua_npz.tar", "train.tar", "gt_bua_npz.tar",
            topN=1, with_loc=True, with_gt_relation=True,
        )
    finally:
        sys.path.remove(REF)
        sys.path.remove(ref_dl)

    from structured_alignment_vqa_tpu.data.node_graph_dataset import (
        NodeGraphDataset, config_for_variant,
    )

    cfg = config_for_variant("itp_GTRelPredNode_bbox", fixture_dir,
                             q_tar="train.tar", maxlen=10_000, min_cnt=50)
    ours = NodeGraphDataset("train", cfg)

    n = 0
    for i in range(len(ours)):
        ref_item = ref[i]
        if ref_item is None:
            continue
        vis_fea, nodes_idx, edges, q_idx, q_edges, answer, idx_of_obj = ref_item
        s = ours.sample(i)
        assert s is not None, i
        np.testing.assert_array_equal(s.vis_fea, vis_fea, err_msg=f"vis {i}")
        np.testing.assert_array_equal(s.node_ids, nodes_idx, err_msg=f"nodes {i}")
        assert [list(e) for e in s.edges] == [list(e) for e in edges], f"edges {i}"
        np.testing.assert_array_equal(s.q_ids, q_idx, err_msg=f"q {i}")
        assert s.answer == int(answer)
        n += 1
    assert n >= 10, n


def test_objrel_supernode_matches_reference(fixture_dir):
    """The only_obj=False super-node loader (`data_loader_itp_bbox_super_node.py`)
    vs ours: macro chain + __empty__ pair nodes + deterministic positive
    relation records ([obj_i, obj_j, rel_cat, macro_loc, micro_loc])."""
    import types

    ref_dl = os.path.join(os.path.dirname(REF), "dataloader")
    sys.path.insert(0, REF)
    sys.path.insert(0, ref_dl)
    try:
        import data_loader_itp_bbox_super_node as ref_mod

        opt = types.SimpleNamespace(
            data_dir_azure=fixture_dir,
            gt_relation_fn="GT_relations_dict_compsite.json",
            enc_vocab_fn="preprocessed/de.vocab.composite2.tsv",
            ans_vocab_fn="preprocessed/en.vocab.tsv",
            obj_vocab_fn="objects_vocab.txt",
            attr_vocab_fn="attributes_vocab.txt",
            bbox_bin_num=64,
            min_cnt=50,
            maxlen=10_000,
            bg_class=9,
        )
        ref = ref_mod.GQADataset_super_node(
            "train", opt, "gt_bua_npz.tar", "train.tar", "gt_bua_npz.tar",
            topN=2, with_loc=True,
        )
    finally:
        sys.path.remove(REF)
        sys.path.remove(ref_dl)

    from structured_alignment_vqa_tpu.data.dataset import DataConfig, GQASuperNodeDataset

    cfg = DataConfig(
        data_dir=fixture_dir, q_tar="train.tar", maxlen=10_000, topn=2,
        min_cnt=50, with_loc=True, only_obj=False, pred_rel=False,
        ragged_candidates="drop",
    )
    ours = GQASuperNodeDataset("train", cfg)

    n = 0
    for i in range(len(ours)):
        ref_item = ref[i]
        if ref_item is None:
            continue
        (vis_fea, macro_idx, obj_locs, macro_edges, micro_pos, micro_neg,
         pos_rel_wrd, neg_rel_wrd, pos_rel_loc, neg_rel_loc,
         q_idx, q_edges, answer, topn) = ref_item
        s = ours.sample(i)
        assert s is not None, i
        np.testing.assert_array_equal(s.macro_ids, macro_idx, err_msg=f"macro {i}")
        np.testing.assert_array_equal(s.obj_locs, obj_locs, err_msg=f"locs {i}")
        assert [list(e) for e in s.macro_edges] == [list(e) for e in macro_edges]
        np.testing.assert_array_equal(s.micro_pos_obj, micro_pos)
        # deterministic relation records: tokens and full 5-tuple locs.
        # rel_cat ids are compared via relation *names*: the reference derives
        # ids from `list(set(...))` — iteration order depends on
        # PYTHONHASHSEED, so its ids are not even stable across runs; we use
        # first-occurrence order (docs/PARITY.md).
        np.testing.assert_array_equal(s.micro_pos_rel, pos_rel_wrd, err_msg=f"rel wrd {i}")
        ref_loc = np.asarray(pos_rel_loc).reshape(-1, 5)
        np.testing.assert_array_equal(
            s.micro_pos_rel_loc[:, [0, 1, 3, 4]], ref_loc[:, [0, 1, 3, 4]],
            err_msg=f"rel loc {i}")

        def cat_name(clean, cat):
            return "<pad>" if cat >= len(clean) else clean[cat]
        for r in range(ref_loc.shape[0]):
            assert cat_name(ref.gt_relation_clean, ref_loc[r, 2]) ==                 cat_name(ours.builder.gt_relation_clean, s.micro_pos_rel_loc[r, 2]), (i, r)
        # negatives are sampled (stream differs); counts may differ only when
        # the reference would have crashed (pool underflow) — here both exist
        assert s.micro_neg_rel_loc.shape[1] == 5
        n += 1
    assert n >= 5, n

"""Node-graph loader family tests: each variant preset builds samples from the
fixtures, quirk flags behave, and the collate feeds the x-family models."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.fixtures import write_fixture
from structured_alignment_vqa_tpu.data.node_graph_dataset import (
    NodeGraphConfig,
    NodeGraphDataset,
    collate_node_graph,
    config_for_variant,
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ng_fixture"))
    write_fixture(root, n_images=8, n_questions=24, seed=3)
    return root


def make_ds(fixture_dir, variant, **kw):
    cfg = config_for_variant(variant, fixture_dir, q_tar="train.tar",
                             maxlen=200, topn=2, min_cnt=50, **kw)
    return NodeGraphDataset("train", cfg)


ALL_VARIANTS = [
    "itp", "itp_gt", "itp_gt_bbox", "itp_gtWpred_bbox",
    "itp_GTRelPredNode_bbox", "itp_GTRelPredNode_bbox_freq",
    "itp_bbox_q", "itp_bbox_aug",
]


@pytest.mark.parametrize("variant", ALL_VARIANTS)
def test_variant_produces_samples(fixture_dir, variant):
    ds = make_ds(fixture_dir, variant)
    ok = 0
    for i in range(len(ds)):
        s = ds.sample(i)
        if s is None:
            continue
        ok += 1
        assert s.vis_fea.ndim == 2 and s.vis_fea.shape[1] == 2048
        assert s.node_ids.ndim == 1 and len(s.node_ids) > 0
        for a, b in s.edges:
            assert 0 <= a and 0 <= b
    assert ok >= len(ds) // 2, f"{variant}: only {ok}/{len(ds)} samples"


def test_visrel_graph(fixture_dir):
    """visGraph path: vis-branch symbolic nodes with syb2vis/valid2all."""
    ds = make_ds(fixture_dir, "itp_bbox_visrel")
    s = next(s for s in (ds.sample(i) for i in range(len(ds))) if s is not None)
    assert s.vis_node_ids is not None and len(s.vis_node_ids)
    assert s.syb2vis.shape[1] == 2
    # one vis node per region, mapped in order
    assert (s.syb2vis[:, 1] == np.arange(len(s.syb2vis))).all()
    for a, b in s.vis_edges:
        assert 0 <= a < len(s.vis_node_ids) + 1


def test_visrel_background_nodes(fixture_dir):
    """Out-of-range detections become __background__ nodes connected to all."""
    ds = make_ds(fixture_dir, "itp_bbox_visrel")
    data_info = {"objects_id": [[999], [0], [1]], "attrs_id": [0, 1, 0]}
    bbox = np.array([[1, 2, 3, 4]] * 3, np.int32)
    nodes, edges, syb2vis, valid2all = ds._nodes_visrel(data_info, bbox)
    assert nodes[0] == "__background__"
    assert valid2all == [1, 2]  # region 0 invalid
    # background row 0 connected to every region node row
    assert [0, 1] in [list(e) for e in edges] and [2, 0] in [list(e) for e in edges]


def test_idx_of_obj_emitted(fixture_dir):
    ds = make_ds(fixture_dir, "itp_bbox_q")
    s = next(s for s in (ds.sample(i) for i in range(len(ds))) if s is not None)
    assert s.idx_of_obj is not None
    assert (s.idx_of_obj >= 0).all()


def test_gt_off_by_one_flag(fixture_dir):
    quirky = make_ds(fixture_dir, "itp_gt")
    fixed = make_ds(fixture_dir, "itp_gt", gt_off_by_one=False)
    i = next(i for i in range(len(quirky)) if quirky.sample(i) is not None)
    sq, sf = quirky.sample(i), fixed.sample(i)
    # quirky edges reference the *next* row; fixed edges reference object rows
    eq = set(sq.edges)
    ef = set(sf.edges)
    assert eq != ef
    # fixed: every edge endpoint is a valid node index
    for a, b in ef:
        assert a < len(sf.node_ids) and b < len(sf.node_ids)


def test_label_noise_changes_nodes(fixture_dir):
    # same node source (pred_node), with vs without the dataAug noise
    clean = make_ds(fixture_dir, "itp_bbox_aug", label_noise_rate=0.0)
    noisy = make_ds(fixture_dir, "itp_bbox_aug", label_noise_rate=1.0)
    diffs = 0
    for i in range(len(clean)):
        a, b = clean.sample(i), noisy.sample(i)
        if a is None or b is None:
            continue
        if len(a.node_ids) == len(b.node_ids) and (a.node_ids != b.node_ids).any():
            diffs += 1
    assert diffs > 0


def test_collate_and_x_family_forward(fixture_dir):
    from structured_alignment_vqa_tpu.models.config import tiny_test_config
    from structured_alignment_vqa_tpu.models.variants import MaxPoolDualEncoder

    ds = make_ds(fixture_dir, "itp_gt")
    samples = [ds.sample(i) for i in range(6)]
    lv, ls, lq = 6, 48, 12
    batch = collate_node_graph(samples, lv, ls, lq)
    assert batch["vis_fea"].shape == (6, lv, 2048)
    assert batch["node_graph"].shape == (6, ls, ls)

    cfg = tiny_test_config(vocab_size=401000, glove_dim=8, maxlen=ls, maxlen_q=lq, maxlen_v=lv)
    model = MaxPoolDualEncoder(cfg, stage_style="x2")
    args = (
        jnp.asarray(batch["vis_fea"]), jnp.asarray(batch["q_ipt"], jnp.int32),
        jnp.asarray(batch["q_mask"]), jnp.asarray(batch["q_graph"]),
        jnp.asarray(batch["node_ipt"], jnp.int32), jnp.asarray(batch["node_mask"]),
        jnp.asarray(batch["node_graph"]),
    )
    params = model.init(jax.random.key(0), *args)
    out = model.apply(params, *args)
    assert out.shape == (6, cfg.num_classes)
    assert np.isfinite(np.asarray(out)).all()

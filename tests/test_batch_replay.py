"""Batch-replay training loader (data/dataset.py batch_replay_dir)."""

import numpy as np
import pytest

from structured_alignment_vqa_tpu.data.dataset import BatchLoader, DataConfig, GQASuperNodeDataset
from structured_alignment_vqa_tpu.data.fixtures import write_fixture


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("replay_data"))
    write_fixture(root, n_images=8, n_questions=40, seed=3)
    return root


def _loader(fixture_dir, tmp, **kw):
    cfg = DataConfig(
        data_dir=fixture_dir, fea_tar="gt_bua_npz.tar", q_tar="train.tar",
        g_tar="gt_bua_npz.tar", maxlen=128, topn=2, only_obj=True,
        min_cnt=50, with_loc=True,
    )
    ds = GQASuperNodeDataset("train", cfg)
    return BatchLoader(ds, 4, shuffle=True, seed=5, num_threads=2,
                       drop_last=False, batch_replay_dir=tmp, **kw)


def _key(b):
    return float(np.asarray(b.vis_fea).sum()) + int(np.asarray(b.q_ipt).sum())


def test_replay_freezes_composition_and_shuffles_order(fixture_dir, tmp_path):
    loader = _loader(fixture_dir, str(tmp_path / "replay"))

    loader.set_epoch(0)
    ep0 = [_key(b) for b in loader]  # builds + persists
    assert any(f.name.startswith("batches-") and f.suffix == ".bin"
               for f in (tmp_path / "replay").iterdir())

    loader.set_epoch(1)
    ep1 = [_key(b) for b in loader]  # replays, permuted order
    loader.set_epoch(2)
    ep2 = [_key(b) for b in loader]

    # same multiset of batches every epoch (composition frozen)...
    assert sorted(ep0) == sorted(ep1) == sorted(ep2)
    # ...but the order varies with the epoch (len>2 makes identity unlikely)
    assert len(ep0) > 2
    assert ep1 != ep2 or ep0 != ep1

    # replayed batches are bit-exact copies of the materialized ones
    loader.set_epoch(1)
    again = [_key(b) for b in loader]
    assert again == ep1  # deterministic per-epoch order


def test_replay_roundtrips_batches_exactly(fixture_dir, tmp_path):
    # shuffle=False: the replay order is the identity, so the second pass
    # must be a bit-exact replica of the built batches
    loader = _loader(fixture_dir, str(tmp_path / "replay2"))
    loader.shuffle = False
    built = list(loader)
    replayed = list(loader)
    assert len(built) == len(replayed)
    for a, b in zip(built, replayed):
        np.testing.assert_array_equal(np.asarray(a.vis_fea), np.asarray(b.vis_fea))
        np.testing.assert_array_equal(np.asarray(a.answer), np.asarray(b.answer))
        np.testing.assert_array_equal(np.asarray(a.macro_graph), np.asarray(b.macro_graph))

"""Materialized-collated-batch cache (`data/batch_cache.py`).

The serving/eval fast path: a fixed (shuffle=False) batch stream must come
back bit-identical from the mmap cache, packed-field Nones and dropped-sample
accounting included.
"""

import dataclasses

import numpy as np
import pytest

from structured_alignment_vqa_tpu.data.batch_cache import (
    _pack_batch, _unpack_batch, valid_batch_cache,
)
from structured_alignment_vqa_tpu.data.dataset import (
    BatchLoader, BatchShape, DataConfig, GQASuperNodeDataset,
)
from structured_alignment_vqa_tpu.data.fixtures import write_fixture
from tests.test_sample_cache import batches_equal


@pytest.fixture
def ds(tmp_path):
    d = tmp_path / "data"
    write_fixture(str(d), n_images=6, n_questions=24, seed=3)
    cfg = DataConfig(data_dir=str(d), maxlen=128, topn=2)
    return GQASuperNodeDataset("train", cfg)


BUCKETS = [BatchShape(16, 48, 16)]


def test_record_roundtrip(ds):
    loader = BatchLoader(ds, 4, buckets=BUCKETS, shuffle=False,
                         drop_last=False, num_threads=2)
    b = next(iter(loader))
    b2 = _unpack_batch(memoryview(_pack_batch(b)), 0)
    batches_equal(b, b2)


def test_second_pass_identical(ds, tmp_path):
    mk = lambda bc: BatchLoader(
        ds, 4, buckets=BUCKETS, shuffle=False, drop_last=False,
        num_threads=2, batch_cache_dir=bc,
    )
    cached = mk(str(tmp_path / "bc"))
    plain = mk(None)
    e1 = list(cached)   # builds
    e2 = list(cached)   # mmap streams
    want = list(plain)
    assert len(e1) == len(e2) == len(want) > 0
    for a, b, c in zip(e1, e2, want):
        batches_equal(a, b)
        batches_equal(a, c)
    assert cached.last_dropped == plain.last_dropped


def test_tight_stream_cached(ds, tmp_path):
    """tight (packed-collate) batches carry the seg/pos extras — they must
    round-trip too (None vs array dispatch in the record format)."""
    mk = lambda: BatchLoader(
        ds, 4, buckets=BUCKETS, shuffle=False, drop_last=False,
        num_threads=2, tight=True, batch_cache_dir=str(tmp_path / "bc"),
    )
    e1 = list(mk())
    e2 = list(mk())
    assert e1[0].q_seg is not None
    for a, b in zip(e1, e2):
        batches_equal(a, b)


def test_shuffle_raises(ds, tmp_path):
    with pytest.raises(ValueError, match="shuffle"):
        BatchLoader(ds, 4, buckets=BUCKETS, shuffle=True,
                    batch_cache_dir=str(tmp_path / "bc"))


def test_config_change_invalidates(ds, tmp_path):
    mk = lambda bs: BatchLoader(
        ds, bs, buckets=BUCKETS, shuffle=False, drop_last=False,
        num_threads=2, batch_cache_dir=str(tmp_path / "bc"),
    )
    l4 = mk(4)
    list(l4)
    assert valid_batch_cache(str(tmp_path / "bc"), l4._batch_fingerprint())
    l2 = mk(2)
    with pytest.warns(UserWarning, match="different"):
        assert valid_batch_cache(
            str(tmp_path / "bc"), l2._batch_fingerprint()
        ) is None
    # and iterating under the new config rebuilds rather than misreads
    with pytest.warns(UserWarning, match="different"):
        b = next(iter(l2))
    assert b.vis_fea.shape[0] == 2


def test_interrupted_pass_leaves_no_cache(ds, tmp_path):
    loader = BatchLoader(
        ds, 4, buckets=BUCKETS, shuffle=False, drop_last=False,
        num_threads=2, batch_cache_dir=str(tmp_path / "bc"),
    )
    it = iter(loader)
    next(it)
    it.close()
    assert valid_batch_cache(
        str(tmp_path / "bc"), loader._batch_fingerprint()
    ) is None
    list(loader)
    assert valid_batch_cache(
        str(tmp_path / "bc"), loader._batch_fingerprint()
    ) is not None

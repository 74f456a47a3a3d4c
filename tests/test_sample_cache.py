"""Cross-epoch preprocessed-sample cache (`data/sample_cache.py`).

Soundness hinges on Sample being a pure function of (DataConfig, index) —
the loader must emit bit-identical batches whether samples come from the
tar/graph-builder path or the mmap cache.
"""

import dataclasses

import numpy as np
import pytest

from structured_alignment_vqa_tpu.data.dataset import (
    BatchLoader, BatchShape, DataConfig, GQASuperNodeDataset,
)
from structured_alignment_vqa_tpu.data.fixtures import write_fixture
from structured_alignment_vqa_tpu.data.sample_cache import (
    SampleCache, SampleCacheWriter, pack_sample, unpack_sample, valid_cache,
)


@pytest.fixture
def ds(tmp_path):
    d = tmp_path / "data"
    write_fixture(str(d), n_images=6, n_questions=24, seed=3)
    cfg = DataConfig(data_dir=str(d), maxlen=128, topn=2)
    return GQASuperNodeDataset("train", cfg)


def batches_equal(a, b):
    fa = {f.name: getattr(a, f.name) for f in dataclasses.fields(a)}
    fb = {f.name: getattr(b, f.name) for f in dataclasses.fields(b)}
    assert set(fa) == set(fb)
    for k in fa:
        if fa[k] is None or fb[k] is None:
            assert fa[k] is None and fb[k] is None, k
            continue
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)


class TestRecordFormat:
    def test_roundtrip(self, ds):
        s = ds.sample(0)
        assert s is not None
        rec = pack_sample(s)
        s2 = unpack_sample(rec)
        np.testing.assert_allclose(s2.vis_fea, s.vis_fea)
        np.testing.assert_array_equal(s2.macro_ids, s.macro_ids)
        np.testing.assert_array_equal(
            s2.macro_edges, np.asarray(s.macro_edges, np.int64).reshape(-1, 2)
        )
        np.testing.assert_array_equal(s2.q_ids, s.q_ids)
        assert s2.answer == s.answer
        assert s2.micro_pos_rel is None

    def test_roundtrip_with_relations(self, tmp_path):
        d = tmp_path / "reldata"
        write_fixture(str(d), n_images=4, n_questions=8, seed=1)
        cfg = DataConfig(data_dir=str(d), maxlen=128, topn=2, only_obj=False)
        ds = GQASuperNodeDataset("train", cfg)
        s = next(s for i in range(8) if (s := ds.sample(i)) is not None)
        s2 = unpack_sample(pack_sample(s))
        np.testing.assert_array_equal(s2.micro_pos_rel, s.micro_pos_rel)
        np.testing.assert_array_equal(s2.micro_pos_rel_loc, s.micro_pos_rel_loc)
        np.testing.assert_array_equal(s2.micro_neg_rel_loc, s.micro_neg_rel_loc)


class TestWriterReader:
    def test_build_and_read(self, ds, tmp_path):
        w = SampleCacheWriter(str(tmp_path / "c"), len(ds), ds.split, ds.cfg)
        for i in range(len(ds)):
            w.add(i, ds.sample(i))
        assert w.finalize()
        cache = SampleCache(str(tmp_path / "c"))
        assert len(cache) == len(ds)
        for i in range(len(ds)):
            a, b = ds.sample(i), cache.sample(i)
            if a is None:
                assert b is None
            else:
                np.testing.assert_allclose(b.vis_fea, a.vis_fea)
                assert b.answer == a.answer

    def test_incomplete_pass_not_published(self, ds, tmp_path):
        w = SampleCacheWriter(str(tmp_path / "c"), len(ds), ds.split, ds.cfg)
        w.add(0, ds.sample(0))
        assert not w.finalize()
        assert valid_cache(str(tmp_path / "c"), ds.split, ds.cfg) is None

    def test_fingerprint_mismatch_ignored(self, ds, tmp_path):
        w = SampleCacheWriter(str(tmp_path / "c"), len(ds), ds.split, ds.cfg)
        for i in range(len(ds)):
            w.add(i, ds.sample(i))
        assert w.finalize()
        other = dataclasses.replace(ds.cfg, topn=3)
        with pytest.warns(UserWarning, match="different"):
            assert valid_cache(str(tmp_path / "c"), ds.split, other) is None
        # perf-only knob does NOT invalidate
        perf = dataclasses.replace(ds.cfg, image_cache_size=7)
        assert valid_cache(str(tmp_path / "c"), ds.split, perf) is not None


class TestLoaderIntegration:
    def test_epochs_identical_with_cache(self, ds, tmp_path):
        buckets = [BatchShape(16, 48, 16)]
        mk = lambda cd: BatchLoader(
            ds, 4, buckets=buckets, shuffle=True, seed=11, drop_last=False,
            num_threads=2, cache_dir=cd,
        )
        plain = mk(None)
        cached = mk(str(tmp_path / "c"))
        e1 = list(cached)                     # builds the cache
        assert valid_cache(str(tmp_path / "c"), ds.split, ds.cfg) is not None
        e2 = list(cached)                     # reads the cache
        want = list(plain)
        assert len(e1) == len(e2) == len(want)
        for a, b, c in zip(e1, e2, want):
            batches_equal(a, b)
            batches_equal(a, c)
        # dropped-sample accounting must agree too
        assert cached.last_dropped == plain.last_dropped

    def test_packed_loader_uses_cache(self, ds, tmp_path):
        buckets = [BatchShape(16, 48, 16)]
        mk = lambda: BatchLoader(
            ds, 4, buckets=buckets, shuffle=False, drop_last=False,
            num_threads=2, n_pack=3, cache_dir=str(tmp_path / "c"),
        )
        e1 = list(mk())
        e2 = list(mk())
        for a, b in zip(e1, e2):
            batches_equal(a, b)

    def test_interrupted_epoch_leaves_no_cache(self, ds, tmp_path):
        buckets = [BatchShape(16, 48, 16)]
        loader = BatchLoader(
            ds, 4, buckets=buckets, shuffle=False, drop_last=False,
            num_threads=2, cache_dir=str(tmp_path / "c"),
        )
        it = iter(loader)
        next(it)
        it.close()  # training interrupted mid-epoch
        assert valid_cache(str(tmp_path / "c"), ds.split, ds.cfg) is None
        # the next full pass still builds it
        list(loader)
        assert valid_cache(str(tmp_path / "c"), ds.split, ds.cfg) is not None

    def test_sharded_loader_never_publishes(self, ds, tmp_path):
        buckets = [BatchShape(16, 48, 16)]
        loader = BatchLoader(
            ds, 4, buckets=buckets, shuffle=False, drop_last=False,
            num_threads=2, cache_dir=str(tmp_path / "c"),
            shard_idx=0, num_shards=2,
        )
        list(loader)
        assert valid_cache(str(tmp_path / "c"), ds.split, ds.cfg) is None


def test_concurrent_writers_cannot_corrupt(ds, tmp_path):
    """Two interleaved builders on one cache root (e.g. two trainer
    processes, the round-3 incident): each writer's artifacts are
    token-unique, the atomic meta.json rename picks a winner, and the
    published cache decodes every sample exactly."""
    cdir = str(tmp_path / "cache")
    w1 = SampleCacheWriter(cdir, len(ds), ds.split, ds.cfg)
    w2 = SampleCacheWriter(cdir, len(ds), ds.split, ds.cfg)
    assert w1._tmp != w2._tmp
    # interleave adds in different orders (shuffled epochs)
    order1 = list(range(len(ds)))
    order2 = order1[::-1]
    samples = [ds.sample(i) for i in order1]
    for i, j in zip(order1, order2):
        w1.add(i, samples[i])
        w2.add(j, samples[j])
    assert w1.finalize() and w2.finalize()
    cache = valid_cache(cdir, ds.split, ds.cfg)
    assert cache is not None and cache.meta["token"] == w2.token
    for i in range(len(ds)):
        a, b = samples[i], cache.sample(i)
        if a is None:
            assert b is None
            continue
        np.testing.assert_array_equal(np.asarray(a.vis_fea), np.asarray(b.vis_fea))
        np.testing.assert_array_equal(np.asarray(a.macro_ids), np.asarray(b.macro_ids))
        np.testing.assert_array_equal(np.asarray(a.q_ids), np.asarray(b.q_ids))
        assert a.answer == b.answer
    # losing writer's artifacts were swept
    import os
    leftovers = [f for f in os.listdir(cdir) if w1.token in f]
    assert leftovers == []

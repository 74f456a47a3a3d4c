"""Native C++ tar indexer: parity with python tarfile, and speed sanity."""

import io
import os
import tarfile
import time

import numpy as np
import pytest

from structured_alignment_vqa_tpu.native import tar_index
from structured_alignment_vqa_tpu.data.tar_reader import TarIndex, _python_index


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    root = tmp_path_factory.mktemp("tars")
    path = str(root / "test.tar")
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tar:
        for i in range(200):
            data = rng.bytes(int(rng.integers(1, 5000)))
            # exercise subdirectories and odd sizes
            name = f"dir{i % 7}/member_{i:04d}.bin"
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        # a GNU long name (> 100 chars)
        long_name = "x" * 140 + ".bin"
        info = tarfile.TarInfo(long_name)
        payload = b"longname-payload"
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))
    return path


def test_native_available():
    assert tar_index.available(), "g++ build of the native indexer failed"


def test_native_matches_python_index(archive):
    native = tar_index.index_tar(archive)
    python = _python_index(archive)
    assert native == python


def test_tar_index_uses_native_and_reads(archive):
    idx = TarIndex(archive, prefer_native=True)
    with tarfile.open(archive) as t:
        for m in t.getmembers()[:20]:
            want = t.extractfile(m).read()
            assert idx.read_by_name(m.name) == want


def test_long_name_member(archive):
    idx = TarIndex(archive, prefer_native=True)
    long_name = "x" * 140 + ".bin"
    assert idx.read_by_name(long_name) == b"longname-payload"


def test_native_faster_on_large_archive(tmp_path):
    """The point of the native tier: indexing large archives quickly."""
    path = str(tmp_path / "big.tar")
    blob = b"\0" * 2000
    with tarfile.open(path, "w") as tar:
        for i in range(20000):
            info = tarfile.TarInfo(f"m{i:06d}.npz")
            info.size = len(blob)
            tar.addfile(info, io.BytesIO(blob))

    t0 = time.perf_counter()
    native = tar_index.index_tar(path)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    python = _python_index(path)
    t_python = time.perf_counter() - t0

    assert native == python
    assert len(native) == 20000
    # native should win clearly; keep a loose factor to avoid flakiness
    assert t_native < t_python, (t_native, t_python)

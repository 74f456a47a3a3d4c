"""Materialized collated batches: the serving/eval fast path.

The reference re-runs its whole host pipeline (tar read -> graph build ->
tokenize -> collate) over the *same* val set every epoch
(`main_itp_ddp_tar_super_node.py:380-428` evaluates val and train each
epoch); on a 1-core host that pipeline caps at ~2.5k samples/s while the
chip serves ~10k pairs/s (docs/DESIGN.md). For a FIXED question set and
batch geometry the collated batches are a pure function of the dataset +
loader config, so the first pass can persist them and every later pass
streams mmap'd arrays — ~37 MB/batch of mostly ``vis_fea`` at page-cache
bandwidth, which turns repeated eval/serving from host-bound into chip-bound
even on one core. The cross-epoch *sample* cache (`sample_cache.py`) is the
training-side analogue (training must re-shuffle and re-pack, so it caches
pre-collate; eval order is fixed, so this caches post-collate).

Storage mirrors `sample_cache.py`: an append-only token-named batches
file of fixed-schema records (per-field dtype/shape headers + raw bytes),
with ``meta.json`` (config fingerprint + winning token) renamed into place
as the single atomic publish — an interrupted first pass leaves no usable
cache, and concurrent builders cannot corrupt each other.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import uuid
from typing import Iterator, Optional, Sequence

import numpy as np

from structured_alignment_vqa_tpu.data.batch import VQABatch

_MAGIC = "savqa-batch-cache-v1"
_FIELDS = tuple(f.name for f in dataclasses.fields(VQABatch))


def loader_fingerprint(split: str, data_cfg, batch_size: int,
                       buckets: Sequence, n_pack: int, pack_bucket,
                       tight: bool, drop_last: bool) -> str:
    """Everything that determines the batch stream (shuffle=False assumed)."""
    d = dataclasses.asdict(data_cfg)
    d.pop("image_cache_size", None)
    d.update({
        "__split__": split, "__magic__": _MAGIC, "batch_size": batch_size,
        "buckets": [dataclasses.astuple(b) for b in buckets],
        "n_pack": n_pack, "pack_bucket": str(pack_bucket), "tight": tight,
        "drop_last": drop_last,
    })
    blob = json.dumps(d, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()


def _pack_batch(b: VQABatch) -> bytes:
    head: list = []
    payload: list = []
    for name in _FIELDS:
        arr = getattr(b, name)
        if arr is None:
            head.append("-")
            continue
        a = np.ascontiguousarray(np.asarray(arr))
        head.append([a.dtype.str, list(a.shape)])
        payload.append(a.tobytes())
    hbytes = json.dumps(head).encode()
    return (
        np.int64(len(hbytes)).tobytes() + hbytes + b"".join(payload)
    )


def _unpack_batch(buf, offset: int) -> VQABatch:
    (hlen,) = np.frombuffer(buf, np.int64, 1, offset)
    head = json.loads(bytes(buf[offset + 8:offset + 8 + int(hlen)]))
    pos = offset + 8 + int(hlen)
    kw = {}
    for name, spec in zip(_FIELDS, head):
        if spec == "-":
            kw[name] = None
            continue
        dtype_str, shape = spec
        dt = np.dtype(dtype_str)
        count = 1
        for d in shape:
            count *= d
        kw[name] = np.frombuffer(buf, dt, count, pos).reshape(shape)
        pos += count * dt.itemsize
    return VQABatch(**kw)


class BatchCacheWriter:
    def __init__(self, cache_dir: str, fingerprint: str):
        os.makedirs(cache_dir, exist_ok=True)
        self.dir = cache_dir
        self.fingerprint = fingerprint
        self.offsets: list = []
        # token-unique artifacts + atomic meta.json publish, exactly as in
        # sample_cache.py: concurrent builders on one cache root must not
        # share a temp inode (second open() truncates the first) nor race
        # offsets-of-A against bin-of-B at publish time
        self.token = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self._tmp = os.path.join(cache_dir, f"batches-{self.token}.bin.tmp")
        self._f = open(self._tmp, "wb")
        self._pos = 0

    def add(self, b: VQABatch) -> None:
        rec = _pack_batch(b)
        self.offsets.append(self._pos)
        self._f.write(rec)
        self._pos += len(rec)

    def finalize(self, n_samples_dropped: int = 0) -> None:
        self._f.close()
        os.replace(self._tmp,
                   os.path.join(self.dir, f"batches-{self.token}.bin"))
        np.save(os.path.join(self.dir, f"offsets-{self.token}.npy"),
                np.asarray(self.offsets, np.int64))
        meta_tmp = os.path.join(self.dir, f"meta-{self.token}.json.tmp")
        with open(meta_tmp, "w") as f:
            json.dump({"fingerprint": self.fingerprint,
                       "token": self.token,
                       "n_batches": len(self.offsets),
                       "n_samples_dropped": n_samples_dropped}, f)
        os.replace(meta_tmp, os.path.join(self.dir, "meta.json"))
        self._sweep_stale()

    def _sweep_stale(self) -> None:
        """Best-effort removal of artifacts from losing writers."""
        try:
            with open(os.path.join(self.dir, "meta.json")) as f:
                keep = json.load(f).get("token")
        except (OSError, ValueError):
            return
        for fn in os.listdir(self.dir):
            if (fn.startswith(("batches-", "offsets-")) and ".tmp" not in fn
                    and f"-{keep}." not in fn):
                try:
                    os.unlink(os.path.join(self.dir, fn))
                except OSError:
                    pass

    def abort(self) -> None:
        try:
            self._f.close()
            os.unlink(self._tmp)
        except OSError:
            pass


class BatchCache:
    """mmap-backed reader: iterate collated batches with no host compute."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, "meta.json")) as f:
            self.meta = json.load(f)
        tok = self.meta["token"]
        self.offsets = np.load(os.path.join(cache_dir, f"offsets-{tok}.npy"))
        self.buf = np.memmap(os.path.join(cache_dir, f"batches-{tok}.bin"),
                             np.uint8, "r")

    def __len__(self) -> int:
        return len(self.offsets)

    def __iter__(self) -> Iterator[VQABatch]:
        for off in self.offsets:
            yield _unpack_batch(self.buf, int(off))

    def batch(self, i: int) -> VQABatch:
        """Random access (batch-replay training streams a permuted order)."""
        return _unpack_batch(self.buf, int(self.offsets[i]))


def valid_batch_cache(cache_dir: Optional[str], fingerprint: str) -> Optional[BatchCache]:
    if not cache_dir:
        return None
    if not os.path.exists(os.path.join(cache_dir, "meta.json")):
        return None
    try:
        cache = BatchCache(cache_dir)
    except (OSError, KeyError, ValueError):
        return None  # pre-token layout or torn/missing artifacts: rebuild
    if cache.meta.get("fingerprint") != fingerprint:
        import warnings

        warnings.warn(
            f"batch cache at {cache_dir} was built under a different loader "
            "config; ignoring it (delete the directory to rebuild)",
            stacklevel=2,
        )
        return None
    return cache

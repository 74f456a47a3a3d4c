"""Wire format: ship a batch to the device as 3 arrays instead of 18.

Every host->device transfer pays a fixed per-call cost (transfer-engine
dispatch; on a remote-TPU tunnel it is ~40 ms per array, measured in
docs/DESIGN.md "Transfer batching"). A ``VQABatch`` has 18 leaves, so a
bs-128 training step spent ~750 ms in per-array overhead against ~120 ms of
compute. The reference never hits this because torch DataLoader pin-memory
+ ``.cuda(non_blocking=True)`` amortizes over a local PCIe link
(`main_itp_ddp_tar_super_node.py:271-316` moves tensors one by one).

The TPU-native fix: group the batch by dtype into three flat ``(B, N)``
arrays on the host (f32 = region features, int8 = masks/graphs, int32 =
ids/locations/labels), transfer those, and recover the batch **inside** the
jitted step with static slices + reshapes — XLA fuses the unpacking into
the first consumers, so device-side cost is zero. The leading batch dim is
preserved on every wire array, so the standard ``P('data')`` batch sharding
applies unchanged and multi-host ``make_array_from_process_local_data``
works leaf-for-leaf.

Packing is exact: ``unpack(pack(b)) == b`` bit-for-bit (test_wire.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

import ml_dtypes

from structured_alignment_vqa_tpu.data.batch import VQABatch

# dtype group per transfer array
_GROUPS = {"f32": np.float32, "i32": np.int32, "i8": np.int8}
_BF16 = np.dtype(ml_dtypes.bfloat16)


@dataclasses.dataclass(frozen=True)
class _Field:
    name: str
    group: str           # 'f32' | 'i32' | 'i8'
    offset: int          # column offset into the group's (B, N) array
    shape: Tuple[int, ...]  # per-sample shape (no batch dim)
    dtype: str           # original dtype, restored on unpack


@dataclasses.dataclass(frozen=True)
class WireSpec:
    """Static layout of one bucket's batch on the wire (hashable: identical
    bucket shapes -> equal specs -> one jit cache entry per bucket)."""

    fields: Tuple[_Field, ...]
    sizes: Tuple[Tuple[str, int], ...]  # columns per group

    def size(self, group: str) -> int:
        return dict(self.sizes).get(group, 0)


def _group_of(arr: np.ndarray) -> str:
    if arr.dtype == np.float32:
        return "f32"
    if arr.dtype == np.int8:
        return "i8"
    return "i32"


@struct.dataclass
class WireBatch:
    f32: jax.Array  # (B, Nf) — region features
    i32: jax.Array  # (B, Ni) — ids, locations, labels
    i8: jax.Array   # (B, Nb) — masks and adjacency
    spec: WireSpec = struct.field(pytree_node=False)

    @property
    def batch_size(self) -> int:
        return self.f32.shape[0]

    def unpack(self) -> VQABatch:
        """Recover the VQABatch with static slices (call inside jit)."""
        groups = {"f32": self.f32, "i32": self.i32, "i8": self.i8}
        out = {}
        for f in self.spec.fields:
            n = int(np.prod(f.shape, dtype=np.int64)) if f.shape else 1
            flat = jax.lax.slice_in_dim(groups[f.group], f.offset, f.offset + n, axis=1)
            val = flat.reshape((flat.shape[0],) + f.shape)
            if str(val.dtype) != f.dtype:
                val = val.astype(f.dtype)
            out[f.name] = val
        return VQABatch(**out)


def pack_wire(batch: VQABatch, bf16_features: bool = False) -> WireBatch:
    """Host-side: flatten each numpy leaf per-sample and concatenate by dtype
    group. ``vis_fea`` is the only f32 leaf, so the big transfer is a
    zero-copy reshape, not a concat.

    ``bf16_features``: ship the f32 group as bfloat16 — halves the dominant
    transfer. Unpack casts back to f32, so the step sees bf16-rounded f32
    values; when the model computes in bf16 (``compute_dtype=bfloat16``) the
    results are bit-identical to shipping f32 (f32->bf16 rounds once either
    way; bf16->f32 is exact). Callers must gate this on the compute dtype —
    an f32-compute model would silently lose feature precision.
    """
    cols = {g: [] for g in _GROUPS}
    fields = []
    b = None
    f32_wire = _BF16 if bf16_features else np.float32
    for fld in dataclasses.fields(VQABatch):
        val = getattr(batch, fld.name)
        if val is None:
            continue
        arr = np.asarray(val)
        b = arr.shape[0] if b is None else b
        group = _group_of(arr)
        offset = sum(int(np.prod(a.shape[1:], dtype=np.int64)) for a in cols[group])
        fields.append(_Field(fld.name, group, offset, tuple(arr.shape[1:]), str(arr.dtype)))
        wire_dtype = f32_wire if group == "f32" else _GROUPS[group]
        cols[group].append(
            np.ascontiguousarray(arr.astype(wire_dtype, copy=False)).reshape(b, -1)
        )
    spec = WireSpec(
        fields=tuple(fields),
        sizes=tuple((g, sum(a.shape[1] for a in cols[g])) for g in _GROUPS),
    )
    packed = {
        g: (np.concatenate(cols[g], axis=1) if len(cols[g]) > 1
            else (cols[g][0] if cols[g]
                  else np.zeros((b, 0), f32_wire if g == "f32" else _GROUPS[g])))
        for g in _GROUPS
    }
    return WireBatch(f32=packed["f32"], i32=packed["i32"], i8=packed["i8"], spec=spec)


def as_vqa_batch(batch) -> VQABatch:
    """Accept either wire or direct form — steps call this first."""
    return batch.unpack() if isinstance(batch, WireBatch) else batch

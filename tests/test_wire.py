"""Wire-format batch transfer (data/wire.py): exact round-trip + step parity."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.batch import VQABatch
from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.data.wire import WireBatch, pack_wire
from structured_alignment_vqa_tpu.parallel import make_mesh
from structured_alignment_vqa_tpu.parallel.train_step import put_batch

from test_train_step import setup


def _np_batch(batch: VQABatch) -> VQABatch:
    """Host-side form with the production collate dtypes (int8 masks)."""
    out = {}
    for f in dataclasses.fields(VQABatch):
        v = getattr(batch, f.name)
        if v is None:
            out[f.name] = None
            continue
        a = np.asarray(v)
        if f.name.endswith(("_mask", "_graph")):
            a = a.astype(np.int8)
        out[f.name] = a
    return VQABatch(**out)


def test_roundtrip_exact():
    cfg, model, batch, tx, state = setup(batch_size=4)
    host = _np_batch(batch)
    wire = pack_wire(host)
    assert isinstance(wire.f32, np.ndarray) and wire.f32.dtype == np.float32
    assert wire.i8.dtype == np.int8 and wire.i32.dtype == np.int32
    back = jax.jit(lambda w: w.unpack())(wire)
    for f in dataclasses.fields(VQABatch):
        orig = getattr(host, f.name)
        got = getattr(back, f.name)
        if orig is None:
            assert got is None
            continue
        assert got.shape == orig.shape, f.name
        assert str(got.dtype) == str(orig.dtype), f.name
        np.testing.assert_array_equal(np.asarray(got), orig, err_msg=f.name)


def test_roundtrip_packed_fields():
    """Packed batches carry 6 extra int32 leaves; they ride the i32 group."""
    cfg, model, batch, tx, state = setup(batch_size=4)
    b, lv = batch.vis_fea.shape[:2]
    lq, ls = batch.q_ipt.shape[1], batch.macro_ipt.shape[1]
    host = _np_batch(batch)
    host = dataclasses.replace(
        host,
        answer=np.tile(np.asarray(host.answer)[:, None], (1, 2)),
        sample_valid=np.tile(np.asarray(host.sample_valid)[:, None], (1, 2)),
        vis_seg=np.zeros((b, lv), np.int32),
        macro_seg=np.zeros((b, ls), np.int32),
        q_seg=np.ones((b, lq), np.int32),
        vis_pos=np.arange(lv, dtype=np.int32)[None].repeat(b, 0),
        macro_pos=np.arange(ls, dtype=np.int32)[None].repeat(b, 0),
        q_pos=np.arange(lq, dtype=np.int32)[None].repeat(b, 0),
    )
    wire = pack_wire(host)
    back = wire.unpack()
    np.testing.assert_array_equal(np.asarray(back.q_seg), host.q_seg)
    np.testing.assert_array_equal(np.asarray(back.vis_pos), host.vis_pos)
    assert back.answer.shape == (b, 2)


def test_train_step_wire_parity():
    """One jitted train step over the mesh: wire in == direct in, bit-exact."""
    from structured_alignment_vqa_tpu.parallel.train_step import (
        make_train_step, shard_state,
    )

    cfg, model, batch, tx, state = setup(batch_size=8)
    mesh = make_mesh(8, 1)
    host = _np_batch(batch)
    step = make_train_step(model, tx, cfg)

    # host snapshot: the step donates its input state, and device_put of an
    # already-committed array aliases rather than copies — shard from numpy
    # so each run gets distinct buffers.
    state = jax.tree.map(lambda x: np.asarray(x), state)
    s1 = shard_state(state, mesh)
    s1, m_direct = step(s1, put_batch(host, mesh), jax.random.key(3))
    s2 = shard_state(state, mesh)
    s2, m_wire = step(s2, put_batch(pack_wire(host), mesh), jax.random.key(3))

    for k in m_direct:
        assert float(m_direct[k]) == float(m_wire[k]), k
    a = jax.tree.leaves(s1.params)
    b = jax.tree.leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_spec_hashable_one_compile_per_bucket():
    cfg, model, batch, tx, state = setup(batch_size=4)
    host = _np_batch(batch)
    w1, w2 = pack_wire(host), pack_wire(host)
    assert w1.spec == w2.spec and hash(w1.spec) == hash(w2.spec)


def test_bf16_features_exact_for_bf16_compute():
    """Shipping features as bf16 must be invisible to a bf16-compute model:
    unpack returns f32 whose values are the bf16 rounding the step's own
    cast would apply anyway."""
    import ml_dtypes
    import jax.numpy as jnp

    cfg, model, batch, tx, state = setup(batch_size=4)
    host = _np_batch(batch)
    w = pack_wire(host, bf16_features=True)
    assert w.f32.dtype == np.dtype(ml_dtypes.bfloat16)
    out = jax.jit(lambda wb: wb.unpack().vis_fea)(w)
    assert out.dtype == jnp.float32
    expect = host.vis_fea.astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out), expect)
    # the step's own bf16 cast of the shipped values is idempotent
    np.testing.assert_array_equal(
        expect.astype(ml_dtypes.bfloat16),
        host.vis_fea.astype(ml_dtypes.bfloat16),
    )

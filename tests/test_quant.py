"""int8 weight-only serving: quantizer correctness + end-to-end logits bound.

The serving contract (`ops/quant.py`): a trained float checkpoint converted
with `quantize_params` and served through `int8_serving=True` must produce
(near-)unchanged answers — weights are compressed, numerics of the matmuls
are not otherwise altered.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import tiny_test_config
from structured_alignment_vqa_tpu.ops.quant import (
    QDense,
    quantize_int8,
    quantize_params,
)


class TestQuantizeInt8:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((64, 32)).astype(np.float32)
        for axis in (0, 1):
            q, s = quantize_int8(w, axis=axis)
            assert q.dtype == np.int8 and s.dtype == np.float32
            shape = [1, 1]
            shape[axis] = -1
            deq = q.astype(np.float32) * s.reshape(shape)
            # symmetric int8: per-element error <= scale/2 <= amax/254
            err = np.abs(deq - w)
            amax = np.max(np.abs(w), axis=1 - axis)
            bound = (amax / 254.0 + 1e-7)
            shape = [1, 1]
            shape[axis] = -1
            assert np.all(err <= bound.reshape(shape))

    def test_zero_rows_stay_zero(self):
        w = np.zeros((8, 4), np.float32)
        w[3] = [1.0, -2.0, 0.5, 0.0]
        q, s = quantize_int8(w, axis=0)
        deq = q.astype(np.float32) * s[:, None]
        assert np.all(deq[np.arange(8) != 3] == 0.0)
        assert np.all(s[np.arange(8) != 3] == 1.0)  # no 0-division sentinels

    def test_qdense_matches_dense_math(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((16, 8)).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        x = rng.standard_normal((4, 16)).astype(np.float32)
        q, s = quantize_int8(w, axis=1)
        params = {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(s),
                  "bias": jnp.asarray(b)}
        y = QDense(8).apply({"params": params}, jnp.asarray(x))
        y_ref = x @ (q.astype(np.float32) * s[None, :]) + b
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)


class TestServingInt8:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_test_config(share_glove=True)
        model = AttModelX3(cfg)
        batch = synthetic_batch(cfg, batch=4, lv=5, lq=6, ls=14, seed=0)
        params = jax.jit(model.init)(jax.random.key(0), batch)["params"]
        # move weights off fresh-init knife edges (docs/PARITY.md)
        params = jax.tree.map(
            lambda p: jnp.asarray(
                p + 0.01 * np.random.default_rng(3).standard_normal(p.shape).astype(p.dtype)
            ),
            params,
        )
        return cfg, model, batch, params

    def test_param_tree_layout(self, setup):
        cfg, model, batch, params = setup
        qparams = quantize_params(jax.device_get(params))
        qmodel = AttModelX3(cfg.replace(int8_serving=True))
        expect = jax.eval_shape(
            lambda: qmodel.init(jax.random.key(0), batch)
        )["params"]
        # quantize_params must produce exactly the layout the int8 model declares
        assert jax.tree_util.tree_structure(qparams) == jax.tree_util.tree_structure(expect)
        for (pa, qv), (pb, ev) in zip(
            jax.tree_util.tree_leaves_with_path(qparams),
            jax.tree_util.tree_leaves_with_path(expect),
        ):
            assert qv.shape == ev.shape and qv.dtype == ev.dtype, (pa, qv.shape, ev.shape)

    def test_memory_shrinks(self, setup):
        cfg, model, batch, params = setup
        qparams = quantize_params(jax.device_get(params))

        def nbytes(tree):
            return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

        def glove_bytes(tree):
            return sum(
                v.size * v.dtype.itemsize
                for p, v in jax.tree_util.tree_leaves_with_path(tree)
                if "glove" in str(p)
            )

        assert nbytes(qparams) < nbytes(params)
        # tiny glove_dim=12 pays relatively more for the f32 row scales
        # (1/3 here); the production 300-dim table compresses to 0.253x
        assert glove_bytes(qparams) <= glove_bytes(params) / 3 + 1

    def test_logits_close_and_answers_stable(self, setup):
        cfg, model, batch, params = setup
        lc, lv, ls_, mo, mr = model.apply({"params": params}, batch, deterministic=True)

        qmodel = AttModelX3(cfg.replace(int8_serving=True))
        qparams = quantize_params(jax.device_get(params))
        qlc, qlv, qls, qmo, qmr = qmodel.apply(
            {"params": qparams}, batch, deterministic=True
        )
        # int8 weight error is ~0.4% relative per tensor; after 3 encoder
        # blocks the logit drift stays small relative to logit scale
        scale = max(float(jnp.max(jnp.abs(lc))), 1e-3)
        assert float(jnp.max(jnp.abs(qlc - lc))) / scale < 0.05
        ens = lambda a, b, c: (
            jax.nn.log_softmax(a, -1) + jax.nn.log_softmax(b, -1)
            + jax.nn.log_softmax(c, -1)
        )
        pred = jnp.argmax(ens(lv, ls_, lc), -1)
        qpred = jnp.argmax(ens(qlv, qls, qlc), -1)
        # ensemble argmax unchanged on the fixture batch
        assert np.array_equal(np.asarray(pred), np.asarray(qpred))


def test_int8_with_packed_batch():
    """int8 serving composes with sequence packing: same packed batch, f32 vs
    int8 weights -> near-identical per-slot logits."""
    from structured_alignment_vqa_tpu.data.dataset import BatchShape
    from structured_alignment_vqa_tpu.data.packing import collate_packed
    from tests.test_packing import mk_sample

    # PAD=400000 flows into the collated id arrays, so the vocab must cover it
    cfg = tiny_test_config(
        share_glove=True, vocab_size=401000, glove_dim=8, vis_fea_dim=16,
        maxlen=64, maxlen_q=12, maxlen_v=8, num_classes=7,
    )
    model = AttModelX3(cfg)
    rng = np.random.default_rng(7)
    groups = [[mk_sample(rng, 2, 6, 3, 1), mk_sample(rng, 2, 5, 3, 2)],
              [mk_sample(rng, 3, 7, 4, 3)]]
    batch = jax.tree.map(
        jnp.asarray,
        collate_packed(groups, BatchShape(lv=6, ls=16, lq=8), cfg.topn, n_pack=2,
                       fea_dim=16),
    )
    params = jax.jit(model.init)(jax.random.key(0), batch)["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(
            p + 0.01 * np.random.default_rng(5).standard_normal(p.shape).astype(p.dtype)),
        params,
    )
    lc, _, _, _, _ = model.apply({"params": params}, batch, deterministic=True)
    qmodel = AttModelX3(cfg.replace(int8_serving=True))
    qlc, _, _, _, _ = qmodel.apply(
        {"params": quantize_params(jax.device_get(params))}, batch, deterministic=True
    )
    assert lc.shape == qlc.shape  # (B, K, C) packed layout preserved
    scale = max(float(jnp.max(jnp.abs(lc))), 1e-3)
    assert float(jnp.max(jnp.abs(qlc - lc))) / scale < 0.05

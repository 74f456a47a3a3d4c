"""Train/eval step tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import tiny_test_config
from structured_alignment_vqa_tpu.parallel import (
    make_mesh,
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from structured_alignment_vqa_tpu.parallel.train_step import adam, put_batch, shard_state
from structured_alignment_vqa_tpu.parallel.sharding import param_sharding_rules
from structured_alignment_vqa_tpu.parallel.mesh import MODEL_AXIS


def perturb_params(params, scale=0.05, seed=17):
    """Add noise to every parameter (incl. LayerNorm gamma/beta).

    At exact init (gamma=1, beta=0) post-LN rows can have feature sums that
    are *exactly* 0.0 in fp32, which flips the reference's content-derived
    key masks (sign(|sum|)) under any 1-ulp cross-compilation difference.
    Real (trained) parameters never sit on that knife edge; noise moves the
    test parameters off it so determinism comparisons are meaningful.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(seed), len(leaves))
    noisy = [
        l + scale * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, noisy)


def setup(cfg=None, batch_size=8, **cfg_kw):
    cfg = cfg or tiny_test_config(dropout_rate=0.1, **cfg_kw)
    model = AttModelX3(cfg)
    batch = synthetic_batch(cfg, batch=batch_size, lv=4, lq=5, ls=10, seed=7)
    tx = adam(1e-3)
    state = create_train_state(model, jax.random.key(0), batch, tx)
    state = state.replace(params=perturb_params(state.params))
    return cfg, model, batch, tx, state


def test_train_step_decreases_loss():
    cfg, model, batch, tx, state = setup()
    step = make_train_step(model, tx, cfg)
    rng = jax.random.key(42)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["ce"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_eval_step_metric_sums():
    cfg, model, batch, tx, state = setup()
    ev = make_eval_step(model, cfg)
    m = ev(state, batch)
    assert float(m["n"]) == batch.batch_size
    assert 0 <= float(m["n_correct"]) <= batch.batch_size
    assert np.isfinite(float(m["loss_sum"]))


def test_invalid_samples_do_not_affect_ce():
    """Invalid samples (sample_valid=0) must not influence the loss: swapping
    their contents for arbitrary other data leaves every metric unchanged.

    (This is the static-shape replacement for the reference's collate-time
    None-dropping. The comparison keeps batch shape fixed: the reference
    algorithm's renorm-after-softmax is chaotic in fp32 across different
    compiled shapes, so cross-shape comparisons are not meaningful.)
    """
    from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch

    cfg, model, batch, tx, state = setup(batch_size=4)
    ev = make_eval_step(model, cfg, with_milnce=False)
    other = synthetic_batch(cfg, batch=4, lv=4, lq=5, ls=10, seed=1234)

    valid = jnp.asarray([1, 1, 0, 0], jnp.int32)
    a = batch.replace(sample_valid=valid)
    # same two valid samples, garbage swapped into the invalid slots
    b = jax.tree.map(
        lambda x, y: jnp.concatenate([x[:2], y[2:]], axis=0), batch, other
    ).replace(sample_valid=valid)

    ma, mb = ev(state, a), ev(state, b)
    assert float(ma["n"]) == 2
    np.testing.assert_allclose(float(ma["loss_sum"]), float(mb["loss_sum"]), rtol=1e-6)
    np.testing.assert_allclose(float(ma["n_correct"]), float(mb["n_correct"]))


def test_data_parallel_matches_single_device():
    """Same batch, 8-way data sharding vs single device: identical update."""
    cfg, model, batch, tx, state0 = setup()
    mesh = make_mesh(8, model_parallel=1)
    step = make_train_step(model, tx, cfg)
    rng = jax.random.key(3)

    s_single, m_single = step(state0, batch, rng)

    cfg, model, batch, tx, state1 = setup()
    state1 = shard_state(state1, mesh)
    sharded_batch = put_batch(batch, mesh)
    s_shard, m_shard = step(state1, sharded_batch, rng)

    np.testing.assert_allclose(float(m_single["ce"]), float(m_shard["ce"]), rtol=1e-5)
    a = jax.tree.leaves(s_single.params)[0]
    b = jax.tree.leaves(s_shard.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tensor_parallel_mesh_runs():
    """(data=4, model=2) mesh: tables sharded over model axis, step executes."""
    cfg, model, batch, tx, state = setup()
    mesh = make_mesh(8, model_parallel=2)
    rules = param_sharding_rules(state.params, mesh)
    # at least the nontrivial rules tree exists and matches params
    assert jax.tree_util.tree_structure(rules) == jax.tree_util.tree_structure(state.params)
    state = shard_state(state, mesh)
    step = make_train_step(model, tx, cfg)
    ev = make_eval_step(model, cfg)
    state, metrics = step(state, put_batch(batch, mesh), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    m = ev(state, put_batch(batch, mesh))
    assert float(m["n"]) == batch.batch_size


def test_production_size_table_sharding_spec():
    """The 407k GloVe table must actually get a model-axis shard spec."""
    from jax.sharding import PartitionSpec as P
    from structured_alignment_vqa_tpu.parallel.sharding import param_pspec

    class FakeLeaf:
        shape = (406400, 300)  # divisible by 8

    class Key:
        def __init__(self, k):
            self.key = k

    spec = param_pspec((Key("glove"), Key("table")), FakeLeaf(), model_axis_size=8)
    assert spec == P(MODEL_AXIS, None)

"""Variant eval driver end-to-end on fixtures, and the non-finite-update guard."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.fixtures import write_fixture


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ev_fixture"))
    write_fixture(root, n_images=6, n_questions=16, seed=5)
    return root


@pytest.mark.parametrize("model_v,extra", [
    (1, []), (2, []), (2, ["--with_dec"]),
    (2, ["--variant", "x5_dec_mil", "--loader", "itp_bbox_q"]),
    (2, ["--variant", "x6_dec_mil", "--loader", "itp_bbox_q"]),
])
def test_eval_variants_driver(fixture_dir, tmp_path, model_v, extra):
    from structured_alignment_vqa_tpu.train.evaluate_variants import main

    loss, acc = main([
        "--data_dir_azure", fixture_dir,
        "--output_dir", str(tmp_path / "out"),
        "--model_v", str(model_v),
        "--loader", "itp_gt", "--split", "train", "--q_tar_fn", "train.tar",
        *extra,
        "--batch_size", "4", "--maxlen", "64", "--maxlen_q", "12",
        "--maxlen_v", "6", "--hidden_size", "16", "--num_blocks", "2",
        "--num_heads", "2", "--min_cnt", "50",
        "--vocab_size", "401000", "--glove_dim", "8",
    ])
    assert np.isfinite(loss)
    assert 0.0 <= acc <= 1.0


def test_skip_nonfinite_guard():
    """A poisoned batch (NaN features) must not corrupt params."""
    from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
    from structured_alignment_vqa_tpu.models import AttModelX3
    from structured_alignment_vqa_tpu.models.config import tiny_test_config
    from structured_alignment_vqa_tpu.parallel import create_train_state, make_train_step
    from structured_alignment_vqa_tpu.parallel.train_step import adam

    cfg = tiny_test_config()
    batch = synthetic_batch(cfg, batch=4, lv=4, lq=5, ls=10)
    model = AttModelX3(cfg)
    tx = adam(1e-3)
    state = create_train_state(model, jax.random.key(0), batch, tx)
    step = make_train_step(model, tx, cfg, skip_nonfinite=True)
    rng = jax.random.key(1)

    poisoned = batch.replace(vis_fea=batch.vis_fea.at[0, 0, 0].set(jnp.nan))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state, m = step(state, poisoned, rng)
    assert float(m["skipped"]) == 1.0
    after = state.params
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params still finite and a clean step still updates
    state, m2 = step(state, batch, rng)
    assert float(m2["skipped"]) == 0.0
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.params))
    )
    assert changed

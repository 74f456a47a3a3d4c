"""End-to-end driver tests: the full CLI training path on disk fixtures, and
checkpoint save/resume."""

import glob
import json
import os

import numpy as np
import pytest
import jax

from structured_alignment_vqa_tpu.data.fixtures import write_fixture


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("driver_fixture"))
    write_fixture(root, n_images=8, n_questions=32, seed=1)
    return root


def cli_args(fixture_dir, out_dir, epochs=1):
    return [
        "--data_dir_azure", fixture_dir,
        "--output_dir", out_dir,
        "--model_v", "3",
        "--only_obj", "--with_loc", "--decMask", "--with_MILNCE_loss",
        "--with_smooth_labeling", "--pred_rel",
        "--batch_size", "4",
        "--maxlen", "128", "--maxlen_q", "12", "--maxlen_v", "8",
        "--hidden_size", "16", "--hidden_size_mil", "8",
        "--num_blocks", "3", "--num_heads", "2",
        "--num_epochs", str(epochs),
        "--min_cnt", "50", "--topN", "2",
        "--log_steps", "2", "--log_steps_val", "2",
        "--vocab_size", "401000", "--glove_dim", "8",
        "--num_workers", "2",
    ]


def test_cli_train_one_epoch_and_resume(fixture_dir, tmp_path):
    from structured_alignment_vqa_tpu.train.main import main

    out = str(tmp_path / "run")
    state = main(cli_args(fixture_dir, out, epochs=1))
    assert int(state.step) > 0

    # artifacts: training.log, metrics.jsonl, checkpoint epoch 1
    assert os.path.exists(os.path.join(out, "training.log"))
    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    names = {m["name"] for m in metrics}
    assert {"Test Acc", "Train Acc"} <= names
    ckpts = glob.glob(os.path.join(out, "checkpoints", "*"))
    assert ckpts

    # resume: epoch 1 already done, train to epoch 2
    state2 = main(cli_args(fixture_dir, out, epochs=2))
    assert int(state2.step) > int(state.step)
    log = open(os.path.join(out, "training.log")).read()
    assert "resumed from epoch 1" in log


def test_eval_driver(fixture_dir, tmp_path):
    from structured_alignment_vqa_tpu.train.main import main
    from structured_alignment_vqa_tpu.train.evaluate import main as eval_main

    out = str(tmp_path / "run_eval")
    main(cli_args(fixture_dir, out, epochs=1))
    loss, acc = eval_main(
        cli_args(fixture_dir, out, epochs=1)
        + ["--weight_dir", os.path.join(out, "checkpoints"), "--split", "val",
           "--q_tar_fn_val", "val.tar"]
    )
    assert np.isfinite(loss)
    assert 0.0 <= acc <= 1.0


def test_predict_driver(fixture_dir, tmp_path):
    """Serving CLI: checkpoint -> answer JSONL."""
    import json as _json
    from structured_alignment_vqa_tpu.train.main import main
    from structured_alignment_vqa_tpu.train.predict import main as predict_main

    out = str(tmp_path / "run_pred")
    main(cli_args(fixture_dir, out, epochs=1))
    out_file = str(tmp_path / "answers.jsonl")
    n = predict_main(
        cli_args(fixture_dir, out, epochs=1)
        + ["--weight_dir", os.path.join(out, "checkpoints"),
           "--split", "val", "--q_tar_fn_val", "val.tar", "--out", out_file]
    )
    lines = [_json.loads(l) for l in open(out_file)]
    assert n == len(lines) > 0
    for rec in lines:
        assert {"index", "answer_id", "answer"} <= set(rec)
        assert isinstance(rec["answer"], str)

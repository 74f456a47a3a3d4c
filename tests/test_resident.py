"""Device-resident frozen batches must be training-equivalent to streaming.

The trainer pins replay/eval batches in device memory once (train/loop.py
`_make_resident`) instead of re-shipping every epoch — built for remote-TPU
tunnels where each device_put is slow and leaks host memory in the plugin.
Residency must change WHERE batches live, not WHAT gets computed: same
replay order, same losses, same eval counts.
"""

import json
import os

from structured_alignment_vqa_tpu.data.fixtures import write_fixture
from structured_alignment_vqa_tpu.train import main as train_main


def _run(root, out, cache, resident_gb, epochs=3):
    train_main.main([
        "--data_dir_azure", root, "--output_dir", out, "--model_v", "3",
        "--only_obj", "--with_loc", "--decMask", "--with_MILNCE_loss",
        "--pred_rel", "--batch_size", "4", "--maxlen", "128",
        "--maxlen_q", "12", "--maxlen_v", "8", "--hidden_size", "16",
        "--hidden_size_mil", "8", "--num_blocks", "2", "--num_heads", "2",
        "--num_epochs", str(epochs), "--min_cnt", "50", "--topN", "2",
        "--log_steps", "2", "--log_steps_val", "100",
        "--vocab_size", "401000", "--glove_dim", "8", "--num_workers", "2",
        "--dropout_rate", "0.0", "--lr", "1e-3", "--seed", "7",
        "--cache_dir", cache, "--batch_replay", "--no_resume",
        "--eval_every", str(epochs), "--checkpoint_every", str(epochs),
        "--resident_gb", str(resident_gb),
    ])
    out_metrics = []
    with open(os.path.join(out, "metrics.jsonl")) as f:
        for line in f:
            out_metrics.append(json.loads(line))
    return out_metrics


def test_resident_matches_streaming(tmp_path):
    root = str(tmp_path / "data")
    write_fixture(root, n_images=8, n_questions=32, seed=1)
    cache = str(tmp_path / "cache")  # shared: both runs train on the same
    # frozen epoch-0 batch composition
    # warm the caches first: a cache-BUILD pass yields batches in build
    # order while warm replay shuffles per epoch, so comparable runs must
    # both start from a warm cache
    _run(root, str(tmp_path / "warm"), cache, resident_gb=0, epochs=1)
    m_stream = _run(root, str(tmp_path / "stream"), cache, resident_gb=0)
    m_res = _run(root, str(tmp_path / "resident"), cache, resident_gb=8.0)

    def series(ms, name):
        return [(m["step"], m["value"]) for m in ms if m["name"] == name]

    for name in ("Avg Loss", "Test Acc", "Train Acc"):
        assert series(m_stream, name), name
        assert series(m_stream, name) == series(m_res, name), name

    with open(tmp_path / "resident" / "training.log") as f:
        log = f.read()
    assert "device-resident" in log

"""Held-out learning probe on the generalizable fixture task.

VERDICT r2 #3 groundwork: the round-2 scale-up run could not move off the
answer prior because the fixture's visual features were i.i.d. and detector
labels uncorrelated — nothing generalizable linked inputs to answers
(docs/DESIGN.md "Scale-up run"). `write_fixture(class_feature_sigma=...,
p_detector_correct=...)` plants a recoverable signal: question position token
-> macro position node -> super node -> (mostly correct) detected-label
embedding / class-prototype visual feature -> answer.

This script runs the actual trainer CLI on such a fixture and reports the
val-accuracy trajectory vs the answer prior. Small preset = CPU sanity;
prod preset = the real chip run (production obj-only shapes).
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import tarfile


def answer_prior(root: str, split: str) -> float:
    """Majority-answer frequency over the split — the bar to beat."""
    counts: collections.Counter = collections.Counter()
    with tarfile.open(os.path.join(root, f"{split}.tar")) as tar:
        for m in tar.getmembers():
            q = json.load(tar.extractfile(m))
            counts[q["answer"]] += 1
    total = sum(counts.values())
    return counts.most_common(1)[0][1] / total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["small", "prod"], default="small")
    p.add_argument("--root", default="/tmp/learnprobe")
    p.add_argument("--out", default="/tmp/learnprobe_run")
    p.add_argument("--epochs", type=int, default=0, help="0 = preset default")
    p.add_argument("--skip_gen", action="store_true")
    # anything after "--" is appended to the trainer CLI verbatim, e.g.
    # `-- --n_pack 4 --pack_bucket 1` for the packed production run
    # (VERDICT r3 #4) or `-- --sparse_table` for the sparse-optimizer run
    args, extra = p.parse_known_args()

    from structured_alignment_vqa_tpu.data.fixtures import write_fixture

    if args.preset == "small":
        fixture = dict(
            n_images=60, n_questions=2000, seed=3, n_obj_range=(4, 10),
            n_words_range=(3, 8), n_classes=64, bbox_bin_num=16,
            class_feature_sigma=0.3, p_detector_correct=0.95,
        )
        train_flags = [
            "--platform", "cpu",
            "--batch_size", "32", "--lr", "1e-3",
            "--maxlen", "128", "--maxlen_q", "12", "--maxlen_v", "12",
            "--hidden_size", "64", "--hidden_size_mil", "32",
            "--num_blocks", "2", "--num_heads", "2",
            "--num_epochs", str(args.epochs or 12),
            "--min_cnt", "50", "--topN", "2", "--bbox_bin_num", "16",
            "--vocab_size", "402000", "--glove_dim", "64",
            "--log_steps", "20", "--log_steps_val", "20",
            "--num_workers", "2", "--eval_every", "2",
        ]
    else:  # production obj-only shapes (submit.py:72-118 scaled to the chip)
        # The recipe that learns (docs/DESIGN.md "production-scale
        # learning"): a GloVe-*scale* grafted table (every failed attempt
        # trained from the raw xavier 407k table whose rows have norm ~0.04
        # — an operating point the reference never uses, AttModel_x3.py:38)
        # and the reference's lr 1e-4. Data: bin 32 for position-token
        # density, sigma 0.3 / p_correct 0.95, p_easy 0.15, dropout 0.2.
        fixture = dict(
            n_images=600, n_questions=20000, seed=3, n_obj_range=(10, 36),
            n_words_range=(3, 15), n_classes=1600, bbox_bin_num=32,
            class_feature_sigma=0.3, p_detector_correct=0.95, p_easy=0.15,
        )
        glove_npy = os.path.join(args.root, "glove_like.npy")
        if not os.path.exists(glove_npy):
            import numpy as np

            os.makedirs(args.root, exist_ok=True)
            rng = np.random.default_rng(11)
            table = rng.standard_normal((400000, 300)).astype(np.float32)
            table *= np.float32(5.5 / np.sqrt(300))  # GloVe-6B row norms ~5.5
            np.save(glove_npy, table)
        train_flags = [
            "--batch_size", "128", "--lr", "1e-4",
            "--maxlen", "450", "--maxlen_q", "30", "--maxlen_v", "50",
            "--hidden_size", "512", "--hidden_size_mil", "1024",
            "--num_blocks", "6", "--num_heads", "8",
            "--num_epochs", str(args.epochs or 40),
            "--min_cnt", "50", "--topN", "5", "--bbox_bin_num", "32",
            "--vocab_size", "407000", "--glove_dim", "300",
            "--bf16", "--share_glove", "--dropout_rate", "0.2",
            "--glove_path", glove_npy,
            "--log_steps", "50", "--log_steps_val", "50",
            "--num_workers", "4", "--eval_every", "4",
            "--cache_dir", os.path.join(args.out, "cache"),
            "--batch_replay", "--max_checkpoints", "2",
            "--checkpoint_every", "4",
            # remat is what makes full batch residency fit: without it the
            # bs-128 activation peak + 4.8 GB of pinned replay batches +
            # GloVe/Adam state OOM the 16 GB chip at the first replay step
            "--remat",
        ]

    if not args.skip_gen:
        write_fixture(args.root, **fixture)
        print(f"fixture at {args.root}: {fixture}", flush=True)
    print(f"answer prior: train {answer_prior(args.root, 'train'):.4f} "
          f"val {answer_prior(args.root, 'val'):.4f}", flush=True)

    extra = [a for a in extra if a != "--"]
    if extra:
        print(f"extra trainer flags: {extra}", flush=True)
    sys.argv = ["main", "--data_dir_azure", args.root, "--output_dir", args.out,
                "--model_v", "3", "--only_obj", "--with_loc", "--decMask",
                "--with_MILNCE_loss", "--pred_rel"] + train_flags + extra
    from structured_alignment_vqa_tpu.train import main as train_main
    train_main.main()


if __name__ == "__main__":
    main()

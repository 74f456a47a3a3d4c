"""Cluster launcher — the TPU-native counterpart of `models/submit.py`.

The reference submits an Azure ML Estimator (8xV100 nodes, MPI launcher,
blob-mounted data, `submit.py:120-135`) with a production hyperparameter dict
(`submit.py:72-118`). Here the control plane is a command generator for TPU
pods: every host of a TPU VM runs the same training CLI (single-controller
JAX; `jax.distributed.initialize` is driven by TPU metadata, so no
coordinator flags are needed on Cloud TPU), and the same spec can be executed
locally for debugging (the reference's ``--local_debug``).

No cloud credentials live in this file — the reference embeds a storage
account key in source (`submit.py:42-47`), which this build deliberately does
not replicate.

Usage:
    python -m structured_alignment_vqa_tpu.train.launch --preset obj_only \
        --tpu my-tpu --zone us-central2-b --data_dir gs://bucket/gqa --dry_run
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys
from typing import Dict, List

# Production hyperparameters (`submit.py:72-118`): batch 32 / maxlen 450 /
# hidden_size_mil 1024 for obj-only; batch 4 / maxlen 1600 / mil 64 for
# obj+rel. Flags present with empty value in the reference dict are
# store-true switches.
PRESETS: Dict[str, Dict] = {
    "obj_only": {
        "batch_size": 32, "model_v": 3, "maxlen": 450, "maxlen_q": 40,
        "num_blocks": 6, "min_cnt": 50, "dropout_rate": 0.5, "topN": 5,
        "hidden_size_mil": 1024, "log_steps": 100,
        "flags": ["with_loc", "with_dec", "with_bbox", "with_smooth_labeling",
                  "decMask", "with_MILNCE_loss", "only_obj", "pred_rel"],
    },
    "obj_rel": {
        "batch_size": 4, "model_v": 3, "maxlen": 1600, "maxlen_q": 40,
        "num_blocks": 6, "min_cnt": 50, "dropout_rate": 0.5, "topN": 5,
        "hidden_size_mil": 64, "log_steps": 100,
        # use_pallas: the flash attention kernel is 1.8x faster than XLA at
        # this sequence length (docs/DESIGN.md)
        "flags": ["with_loc", "with_dec", "with_bbox", "with_smooth_labeling",
                  "decMask", "with_MILNCE_loss", "pred_rel", "use_pallas"],
    },
}


def build_train_argv(preset: str, data_dir: str, output_dir: str, extra: List[str]) -> List[str]:
    p = PRESETS[preset]
    argv = [
        sys.executable, "-m", "structured_alignment_vqa_tpu.train.main",
        "--data_dir_azure", data_dir,
        "--output_dir", output_dir,
    ]
    for k, v in p.items():
        if k == "flags":
            continue
        argv += [f"--{k}", str(v)]
    for f in p["flags"]:
        argv.append(f"--{f}")
    argv += extra
    return argv


def tpu_vm_command(argv: List[str], tpu: str, zone: str, project: str | None) -> List[str]:
    """gcloud command running the training CLI on every pod worker."""
    remote = " ".join(shlex.quote(a) for a in argv)
    cmd = [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", tpu,
        "--zone", zone, "--worker=all",
        "--command", f"cd ~/structured-alignment-vqa-tpu && {remote}",
    ]
    if project:
        cmd[2:2] = ["--project", project]
    return cmd


def main(argv=None):
    ap = argparse.ArgumentParser(description="SA-VQA TPU job launcher")
    ap.add_argument("--preset", choices=sorted(PRESETS), default="obj_only")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--output_dir", default="output_supernode")
    ap.add_argument("--tpu", default=None, help="TPU VM name; omit for local run")
    ap.add_argument("--zone", default="us-central2-b")
    ap.add_argument("--project", default=None)
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("extra", nargs="*", help="extra flags passed to the trainer")
    args = ap.parse_args(argv)

    train_argv = build_train_argv(args.preset, args.data_dir, args.output_dir, args.extra)
    cmd = (
        tpu_vm_command(train_argv, args.tpu, args.zone, args.project)
        if args.tpu else train_argv
    )
    printable = " ".join(shlex.quote(c) for c in cmd)
    if args.dry_run:
        print(printable)
        return printable
    print(f"launching: {printable}", file=sys.stderr)
    return subprocess.call(cmd)


if __name__ == "__main__":
    main()

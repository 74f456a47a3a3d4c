"""Multi-core loader scaling check (VERDICT r3 #8).

The spawn-based loader process pool is equivalence-tested but the dev box has
ONE core, so its speedup was never observed. CI runners have >= 4 vCPUs; this
script generates a small GQA-format fixture, times a cold epoch with
``num_procs=1`` vs ``num_procs=<cores>``, prints the ratio, and (with
``--assert``) fails unless the pool actually scales. Mirrors the reference's
DataLoader worker knob (`main_itp_ddp_tar_super_node.py:246-249`,
num_workers=8) whose scaling was likewise only ever realized on multi-core
cloud hosts.

Usage: python scripts/ci_loader_scaling.py [--assert] [--min_speedup 1.3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_epoch(root: str, num_procs: int, batch_size: int = 32) -> float:
    from structured_alignment_vqa_tpu.data.dataset import (
        BatchLoader,
        DataConfig,
        GQASuperNodeDataset,
    )

    cfg = DataConfig(
        data_dir=root, fea_tar="gt_bua_npz.tar", q_tar="train.tar",
        g_tar="gt_bua_npz.tar", bbox_bin_num=16, min_cnt=50, topn=2,
        maxlen=128, only_obj=True, with_loc=True, seed=0,
    )
    ds = GQASuperNodeDataset("train", cfg)
    loader = BatchLoader(ds, batch_size, shuffle=False, num_procs=num_procs)
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += batch.vis_fea.shape[0] if hasattr(batch.vis_fea, "shape") else len(batch.vis_fea)
    dt = time.perf_counter() - t0
    print(f"num_procs={num_procs}: {dt:.2f}s ({n / dt:.0f} samples/s)", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/ci_loader_fixture")
    p.add_argument("--assert", dest="do_assert", action="store_true")
    p.add_argument("--min_speedup", type=float, default=1.3)
    p.add_argument("--questions", type=int, default=1500)
    args = p.parse_args()

    cores = os.cpu_count() or 1
    if cores < 2:
        print(f"only {cores} core(s); scaling unmeasurable here — skipping")
        return 0

    from structured_alignment_vqa_tpu.data.fixtures import write_fixture

    if not os.path.exists(os.path.join(args.root, "train.tar")):
        write_fixture(args.root, n_images=80, n_questions=args.questions,
                      seed=5, n_obj_range=(6, 16), n_classes=128,
                      bbox_bin_num=16)

    # warm the tar index / page cache so both timings see the same IO state
    time_epoch(args.root, num_procs=0)
    t1 = time_epoch(args.root, num_procs=1)
    tn = time_epoch(args.root, num_procs=min(cores, 4))
    speedup = t1 / tn
    print(f"loader pool speedup: {speedup:.2f}x on {cores} cores")
    if args.do_assert and speedup < args.min_speedup:
        print(f"FAIL: expected >= {args.min_speedup}x")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Post-process the packed+sparse production matrix (VERDICT r4 #3, r3 #4).

Reads each run produced by ``scripts/run_prod_matrix.sh`` and emits one
comparison table: final/best held-out val accuracy (from metrics.jsonl
"Test Acc"), steady-state steps/s (median of the replay epochs' logged
rates), device-seconds/epoch and pairs/s computed from the epoch wall
times in the console log. Pairs/s uses QUESTIONS per second — the corpus
size is fixed across runs — so the packed runs' fewer-but-denser steps are
compared honestly against the unpacked ones.

Usage: python scripts/prod_matrix_report.py --root /tmp/prodmatrix \
           --runs dense sparse packed [--json out.json]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import statistics

STEP_RE = re.compile(
    r"Time (?P<t>[\d\- :.]+), Epoch \[(?P<e>\d+)/(?P<n>\d+)\], Step \[(?P<s>\d+)\].*"
    r"steps/s: (?P<sps>[\d.]+|None)"
)


def parse_run(root: str, name: str) -> dict:
    out = {"name": name}
    log_path = os.path.join(root, f"{name}.log")
    # epoch -> first timestamp seen; plus all steady-state steps/s samples
    first_ts: dict[int, datetime.datetime] = {}
    steps_in_epoch: dict[int, int] = {}
    sps_samples: list[float] = []
    n_epochs = None
    with open(log_path) as f:
        for line in f:
            m = STEP_RE.search(line)
            if not m:
                continue
            e = int(m.group("e"))
            n_epochs = int(m.group("n"))
            ts = datetime.datetime.fromisoformat(m.group("t").strip())
            first_ts.setdefault(e, ts)
            steps_in_epoch[e] = max(steps_in_epoch.get(e, 0), int(m.group("s")))
            # replay epochs only (epoch >= 3 skips the cache-build and the
            # first replay epoch whose tick includes compile)
            if e >= 3 and m.group("sps") != "None":
                sps_samples.append(float(m.group("sps")))
    # epoch wall seconds from consecutive first-line timestamps, replay only
    epoch_secs = [
        (first_ts[e + 1] - first_ts[e]).total_seconds()
        for e in sorted(first_ts)
        if e >= 3 and e + 1 in first_ts and (first_ts[e + 1] - first_ts[e]).total_seconds() > 0
    ]
    out["epochs"] = n_epochs
    out["steps_per_epoch"] = max(steps_in_epoch.values()) if steps_in_epoch else None
    out["steps_per_sec"] = round(statistics.median(sps_samples), 2) if sps_samples else None
    if epoch_secs:
        med = statistics.median(epoch_secs)
        out["device_seconds_per_epoch"] = round(med, 1)
    # val trajectory
    metrics = os.path.join(root, f"run_{name}", "metrics.jsonl")
    vals = []
    if os.path.exists(metrics):
        with open(metrics) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("name") == "Test Acc":
                    vals.append((rec.get("step"), rec["value"]))
    if vals:
        out["val_acc_by_epoch"] = {str(s): round(v, 4) for s, v in vals}
        out["final_val_acc"] = round(vals[-1][1], 4)
        out["best_val_acc"] = round(max(v for _, v in vals), 4)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/prodmatrix")
    p.add_argument("--runs", nargs="+", default=["dense", "sparse", "packed"])
    p.add_argument("--n_questions", type=int, default=20000,
                   help="train questions/epoch — fixed corpus, the honest "
                        "pairs/s numerator across packed and unpacked runs")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    rows = []
    for name in args.runs:
        try:
            r = parse_run(args.root, name)
        except FileNotFoundError as e:
            r = {"name": name, "error": str(e)}
        if r.get("device_seconds_per_epoch"):
            r["train_pairs_per_sec"] = round(
                args.n_questions / r["device_seconds_per_epoch"], 1)
        rows.append(r)

    hdr = ["run", "steps/ep", "steps/s", "dev-s/ep", "pairs/s", "final val", "best val"]
    print("  ".join(f"{h:>10}" for h in hdr))
    for r in rows:
        print("  ".join(f"{str(r.get(k, '-')):>10}" for k in [
            "name", "steps_per_epoch", "steps_per_sec",
            "device_seconds_per_epoch", "train_pairs_per_sec",
            "final_val_acc", "best_val_acc"]))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

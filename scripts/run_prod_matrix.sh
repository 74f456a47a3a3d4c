#!/bin/bash
# The packed + sparse production learning matrix (VERDICT r4 #3, r3 #4).
#
# Three 40-epoch runs of the production recipe (scripts/learn_probe.py
# --preset prod, the round-3 "run that learns" configuration) on the
# attached chip, sharing one fixture:
#   dense   — unpacked, dense Adam over the 407k GloVe table (r3 baseline)
#   sparse  — unpacked, sparse/segmented table optimizer + bf16 moments
#   packed  — n_pack 4 packing x sparse table (submit.py:76-87 length mix)
# Logs land in /tmp/prodmatrix/<name>.log; steps/s and val accuracy are
# post-processed from each run's metrics.jsonl by scripts/prod_matrix_report.py.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
ROOT=/tmp/prodmatrix
mkdir -p $ROOT
GEN=""
for spec in "dense:" "sparse:--sparse_table --table_moments_bf16" \
            "packed:--n_pack 4 --pack_bucket 1 --sparse_table --table_moments_bf16"; do
  name=${spec%%:*}; extra=${spec#*:}
  echo "=== $name (extra: $extra) $(date -u +%H:%M:%S) ==="
  # --log_steps 10: packed epochs have ~4x fewer steps; the matrix report
  # times epochs from the logged step lines and needs several per epoch.
  # 24 epochs (round-3 dense hit .605 at 24 of its 40-epoch .736 arc) keeps
  # the three-run matrix inside one session; --cache_dir is shared so the
  # sparse run replays dense's fingerprint-matched frozen batches and the
  # packed run reuses the sample cache (data/batch_cache.py fingerprints).
  timeout 4500 python scripts/learn_probe.py --preset prod --epochs 24 \
    --root $ROOT/data --out $ROOT/run_$name $GEN -- --log_steps 10 \
    --cache_dir $ROOT/cache $extra \
    > $ROOT/$name.log 2>&1
  echo "exit=$? $(date -u +%H:%M:%S)"
  GEN="--skip_gen"
done
echo "ALL DONE $(date -u +%H:%M:%S)"

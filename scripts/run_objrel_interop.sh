#!/bin/bash
# The obj+rel interop loop (VERDICT r4 #4b, r3 #5b): train a small
# only_obj=False model HERE (CPU, relation MIL branch active), export it,
# and have the unmodified reference AttModel_x3 strict-load + eval it so the
# export map's R tensor / relation rows are exercised by torch.
#
# Flags mirror scripts/eval_in_reference.py:OBJREL_SMALL_FLAGS exactly —
# the eval rebuilds the model from that preset, so any drift breaks the
# strict load (which is the point).
set -eu
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
ROOT=${1:-/tmp/objrel}
OUT=$ROOT/run

python - << EOF
from structured_alignment_vqa_tpu.data.fixtures import write_fixture
write_fixture("$ROOT", n_images=60, n_questions=2000, seed=5,
              n_obj_range=(4, 10), n_words_range=(3, 8), n_classes=64,
              bbox_bin_num=16, class_feature_sigma=0.3,
              p_detector_correct=0.95)
EOF

python -m structured_alignment_vqa_tpu.train.main \
  --data_dir_azure $ROOT --output_dir $OUT --platform cpu \
  --model_v 3 --with_loc --decMask --with_MILNCE_loss \
  --batch_size 32 --maxlen 128 --maxlen_q 12 --maxlen_v 12 \
  --hidden_size 64 --hidden_size_mil 32 --num_blocks 4 --num_heads 2 \
  --min_cnt 50 --topN 2 --bbox_bin_num 16 \
  --vocab_size 407000 --glove_dim 300 --share_glove --dropout_rate 0.2 \
  --num_workers 2 --lr 1e-3 --num_epochs 2 --eval_every 2 \
  --log_steps 20 --log_steps_val 20 --max_checkpoints 1 \
  --sparse_table --table_moments_bf16

python scripts/eval_in_reference.py --config objrel_small \
  --root $ROOT --weight_dir $OUT/checkpoints --batches 8

"""Standalone eval driver.

Equivalent of `eval_itp_grid_ddp_tar_gt.py`: load a checkpoint, run the eval
loop over a chosen loader, print loss + accuracy. Unlike the reference (which
forces world size 1, `eval_itp_grid_ddp_tar_gt.py:191-193`), this jits the
eval step over whatever mesh is available.
"""

from __future__ import annotations

import datetime

import jax

from structured_alignment_vqa_tpu.data.dataset import BatchLoader, GQASuperNodeDataset
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.parallel import create_train_state, make_eval_step
from structured_alignment_vqa_tpu.parallel.mesh import fitting_mesh
from structured_alignment_vqa_tpu.parallel.train_step import adam, put_batch, shard_state
from structured_alignment_vqa_tpu.train.loop import run_eval
from structured_alignment_vqa_tpu.train.main import build_parser, configs_from_args
from structured_alignment_vqa_tpu.utils.checkpoint import load_params_for_eval
from structured_alignment_vqa_tpu.utils.logging import setup_logging


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--weight_dir", type=str, required=True,
                        help="checkpoint directory written by the trainer")
    parser.add_argument("--weight_epoch", type=int, default=None)
    parser.add_argument("--split", type=str, default="val")
    args = parser.parse_args(argv)

    model_cfg, train_dc, val_dc, trainer_cfg = configs_from_args(args)
    dc = val_dc if args.split == "val" else train_dc
    logger = setup_logging(trainer_cfg.output_dir, jax.process_index())

    ds = GQASuperNodeDataset(args.split, dc)
    loader = BatchLoader(ds, trainer_cfg.batch_size, shuffle=False,
                         shard_idx=jax.process_index(), num_shards=jax.process_count())

    model = AttModelX3(model_cfg)
    probe = next(iter(loader))
    state = create_train_state(model, jax.random.key(0), probe, adam(trainer_cfg.lr))
    state = load_params_for_eval(args.weight_dir, state, args.weight_epoch)

    mesh = fitting_mesh(trainer_cfg.batch_size, trainer_cfg.model_parallel)
    state = shard_state(state, mesh)
    eval_step = make_eval_step(model, model_cfg, with_milnce=trainer_cfg.with_milnce)

    loss, n_correct, n = run_eval(
        eval_step, state,
        (put_batch(b, mesh) for b in loader),
        logger, trainer_cfg.log_steps_val, args.split,
    )
    acc = n_correct / max(n, 1)
    logger.info(
        "Time %s, Eval[%s] Loss: %s, accuracy: %s/%s = %s",
        datetime.datetime.now(), args.split, loss, n_correct, n, acc,
    )
    return loss, acc


if __name__ == "__main__":
    main()

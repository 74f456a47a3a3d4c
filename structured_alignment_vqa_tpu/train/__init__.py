"""Drivers: losses, train/eval steps, the epoch loop, checkpointing, CLI."""

from structured_alignment_vqa_tpu.train.losses import (
    ensemble_smoothed_ce,
    mil_nce_loss,
    batch_metrics,
)

"""Utilities: metrics, logging, checkpointing, profiling."""

from structured_alignment_vqa_tpu.utils.metrics import AverageMeter, precision_top_k, mkdir_p
from structured_alignment_vqa_tpu.utils.logging import setup_logging, MetricLogger

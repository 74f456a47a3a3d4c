"""Training objectives.

The v3 training loss (`main_itp_ddp_tar_super_node.py:334-360`): average the
log-softmaxes of the three classifier heads, cross-entropy against the
label-smoothed one-hot answer, optionally add the (negated) MIL-NCE terms.

Static-batch note: the reference drops bad samples at collate time so its
batch mean runs over survivors only; here invalid samples stay in the batch
with ``sample_valid=0`` and the mean divides by the number of valid samples —
per-sample math is identical.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.ops.layers import label_smoothing


def ensemble_log_softmax(logits_concat, logits_vis, logits_syb):
    """Mean of the three heads' log-softmaxes (`main:335-339`)."""
    return (
        jax.nn.log_softmax(logits_vis.astype(jnp.float32), axis=-1)
        + jax.nn.log_softmax(logits_syb.astype(jnp.float32), axis=-1)
        + jax.nn.log_softmax(logits_concat.astype(jnp.float32), axis=-1)
    ) / 3.0


def ensemble_smoothed_ce(
    logits_concat: jax.Array,
    logits_vis: jax.Array,
    logits_syb: jax.Array,
    answer: jax.Array,
    sample_valid: jax.Array,
    smooth_eps: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (mean loss over valid samples, per-sample ensemble log-softmax)."""
    log_sm = ensemble_log_softmax(logits_concat, logits_vis, logits_syb)
    num_classes = log_sm.shape[-1]
    one_hot = jax.nn.one_hot(answer, num_classes, dtype=jnp.float32)
    smoothed = label_smoothing(one_hot, smooth_eps)
    per_sample = -jnp.sum(smoothed * log_sm, axis=-1)
    valid = sample_valid.astype(jnp.float32)
    loss = jnp.sum(per_sample * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return loss, log_sm


def mil_nce_loss(mil_obj: jax.Array, mil_rel: jax.Array, only_obj: bool) -> jax.Array:
    """``-mil_nce_obj [- mil_nce_rel]`` (`main:326-329`)."""
    loss = -mil_obj
    if not only_obj:
        loss = loss - mil_rel
    return loss


def batch_metrics(log_sm: jax.Array, answer: jax.Array, sample_valid: jax.Array):
    """Accuracy counting, reference-style: only samples whose answer is in the
    answer vocabulary (answer != 0) count (`main:125-126`); the denominator is
    the full (valid) batch size, as in the reference's ``cnt += batch_size``.
    """
    pred = jnp.argmax(log_sm, axis=-1)
    valid = sample_valid.astype(jnp.float32)
    in_vocab = (answer != 0).astype(jnp.float32) * valid
    n_correct = jnp.sum((pred == answer).astype(jnp.float32) * in_vocab)
    n = jnp.sum(valid)
    return n_correct, n

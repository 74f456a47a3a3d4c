"""Checkpoint save AND resume (orbax).

The reference only saves (`model_{epoch}.pth`, optimizer state discarded, no
resume path — `main_itp_ddp_tar_super_node.py:424-428`, SURVEY.md section 5.4). Here a
checkpoint carries params + optimizer state + step + epoch, and training can
resume from the latest one.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from structured_alignment_vqa_tpu.parallel.train_step import TrainState


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int, max_to_keep: Optional[int] = None):
    """Save params + opt state + counters under step=epoch (rank-0-safe:
    orbax coordinates across processes itself)."""
    mgr = _manager(ckpt_dir, max_to_keep)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "constants": state.constants,
        "step": state.step,
    }
    if jax.process_count() == 1:
        # Fetch the whole tree to host FIRST, one bulk transfer per leaf:
        # orbax's direct save of device arrays reads them in small chunks,
        # which through the remote-TPU tunnel pays a round trip per chunk
        # (measured: 14.5 min for a 2.7 GB state vs <1 min via device_get).
        # Multi-host keeps orbax's coordinated device path.
        payload = jax.device_get(payload)
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, state: TrainState, epoch: Optional[int] = None) -> Tuple[TrainState, int]:
    """Restore into the structure of ``state``; returns (state, epoch)."""
    mgr = _manager(ckpt_dir)
    if epoch is None:
        epoch = mgr.latest_step()
        if epoch is None:
            mgr.close()
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "constants": state.constants,
        "step": state.step,
    }
    restored = mgr.restore(epoch, args=ocp.args.StandardRestore(template))
    mgr.close()
    new_state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        constants=restored["constants"],
        step=restored["step"],
    )
    return new_state, int(epoch)


def load_params_for_eval(ckpt_dir: str, state: TrainState, epoch: Optional[int] = None) -> TrainState:
    """Eval-driver loader (the reference strips DDP's 'module.' prefix,
    `eval_itp_grid_ddp_tar_gt.py:107-116`; orbax trees need no such surgery).

    Restores ONLY params/constants/step: eval never reads optimizer state,
    and its on-disk structure depends on how the run was trained (plain
    optax tree vs the sparse-table pair) — a dense-state eval template must
    still load a ``--sparse_table`` run's checkpoint, and vice versa."""
    mgr = _manager(ckpt_dir)
    if epoch is None:
        epoch = mgr.latest_step()
        if epoch is None:
            mgr.close()
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    # restore with the ON-DISK structure (no template), then keep only the
    # eval-relevant subtrees — params/constants trees are plain dicts either
    # way, so no structure match against the training-time opt_state needed
    restored = mgr.restore(epoch)
    mgr.close()
    import jax.numpy as jnp

    as_arrays = lambda tree: jax.tree.map(jnp.asarray, tree)
    return state.replace(
        params=as_arrays(restored["params"]),
        constants=as_arrays(restored["constants"]),
        step=jnp.asarray(restored["step"]),
    )

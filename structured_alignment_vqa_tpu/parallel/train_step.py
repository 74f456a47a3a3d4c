"""Sharded train/eval steps.

One jitted function covers what the reference splits across DDP hooks, the
hand-written batch loop, and explicit collective calls
(`main_itp_ddp_tar_super_node.py:268-366,383-404`):

  forward -> ensemble smoothed-CE (+ MIL-NCE) -> grads -> Adam update

Gradient reduction over the data axis is *implicit*: parameters are replicated,
the batch is sharded, so GSPMD inserts the psum where DDP would run its NCCL
allreduce. Eval metrics come back as global sums (the psum replaces the
reference's ``dist.all_gather`` of [loss, n_correct, n] triples).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from structured_alignment_vqa_tpu.data.batch import VQABatch
from structured_alignment_vqa_tpu.data.wire import as_vqa_batch
from structured_alignment_vqa_tpu.models.config import ModelConfig
from structured_alignment_vqa_tpu.parallel.sharding import (
    batch_sharding,
    param_sharding_rules,
)
from structured_alignment_vqa_tpu.train.losses import (
    batch_metrics,
    ensemble_smoothed_ce,
    mil_nce_loss,
)


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    constants: Any = struct.field(default_factory=dict)  # frozen MCB sketches etc.


def create_train_state(model, rng, sample_batch: VQABatch, tx: optax.GradientTransformation) -> TrainState:
    variables = model.init(rng, sample_batch)
    params = variables["params"]
    constants = dict(variables.get("constants", {}))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        constants=constants,
    )


def shard_state(state: TrainState, mesh) -> TrainState:
    """Lay the state out on the mesh.

    Params follow the sharding rules; optimizer-state subtrees that mirror the
    param tree (Adam's mu/nu) follow the same rules so a sharded table's
    moments live next to it; everything else (step counters) is replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rules = param_sharding_rules(state.params, mesh)
    rep = NamedSharding(mesh, P())

    def put(node):
        if _same_structure(node, state.params):
            return jax.device_put(node, rules)
        if isinstance(node, tuple):  # optax chains / namedtuple states
            vals = [put(c) for c in node]
            if hasattr(node, "_fields"):  # namedtuple
                return type(node)(*vals)
            return tuple(vals)
        return jax.device_put(node, rep)

    return TrainState(
        step=jax.device_put(state.step, rep),
        params=jax.device_put(state.params, rules),
        opt_state=put(state.opt_state),
        constants=jax.device_put(state.constants, rep),
    )


def _same_structure(a, b) -> bool:
    return jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: ModelConfig,
    with_milnce: bool = True,
    smooth_eps: float = 0.1,
    skip_nonfinite: bool = True,
) -> Callable:
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    ``skip_nonfinite``: when a step produces any non-finite gradient the
    update is dropped (params/opt state unchanged) and ``metrics['skipped']``
    is 1 — failure containment the reference lacks entirely (SURVEY.md section 5.3;
    its only guard was `torch.autograd.set_detect_anomaly`, a debugger)."""

    def step_fn(state: TrainState, batch: VQABatch, rng: jax.Array):
        batch = as_vqa_batch(batch)  # wire-format batches unpack in-jit (data/wire.py)
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.constants:
                variables["constants"] = state.constants
            lc, lv, ls_, mil_obj, mil_rel = model.apply(
                variables, batch, deterministic=False, rngs={"dropout": dropout_rng}
            )
            ce, log_sm = ensemble_smoothed_ce(
                lc, lv, ls_, batch.answer, batch.sample_valid, smooth_eps
            )
            mil = mil_nce_loss(mil_obj, mil_rel, cfg.only_obj)
            loss = ce + (mil if with_milnce else 0.0)
            n_correct, n = batch_metrics(log_sm, batch.answer, batch.sample_valid)
            return loss, {
                "loss": loss,
                "ce": ce,
                "mil_nce_loss": mil,
                "n_correct": n_correct,
                "n": n,
            }

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        def do_update(operand):
            grads, opt_state, params = operand
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

        if skip_nonfinite:
            finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
            ))
            # lax.cond (not jnp.where over every leaf): the common finite
            # path pays only the Adam update — the per-leaf selects cost a
            # full extra read+write pass over params AND opt state (~8 ms
            # at the bs-128 production point, docs/DESIGN.md round-3 MFU).
            new_params, new_opt_state = jax.lax.cond(
                finite,
                do_update,
                lambda operand: (operand[2], operand[1]),
                (grads, state.opt_state, state.params),
            )
            metrics["skipped"] = 1.0 - finite.astype(jnp.float32)
        else:
            new_params, new_opt_state = do_update(
                (grads, state.opt_state, state.params)
            )

        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model, cfg: ModelConfig, with_milnce: bool = True, smooth_eps: float = 0.1) -> Callable:
    """Jitted ``eval(state, batch) -> metric sums`` (global over the mesh).

    Mirrors the reference eval loop semantics (`main:42-142`): ensemble
    smoothed CE (+ MIL loss when enabled), correctness counted over in-vocab
    answers only. Returns *sums* so the host can aggregate streams, replacing
    the reference's all_gather of per-rank meters.
    """

    def eval_fn(state: TrainState, batch: VQABatch):
        batch = as_vqa_batch(batch)
        variables = {"params": state.params}
        if state.constants:
            variables["constants"] = state.constants
        lc, lv, ls_, mil_obj, mil_rel = model.apply(variables, batch, deterministic=True)
        ce, log_sm = ensemble_smoothed_ce(
            lc, lv, ls_, batch.answer, batch.sample_valid, smooth_eps
        )
        mil = mil_nce_loss(mil_obj, mil_rel, cfg.only_obj)
        loss = ce + (mil if with_milnce else 0.0)
        n_correct, n = batch_metrics(log_sm, batch.answer, batch.sample_valid)
        return {
            "loss_sum": loss * n,
            "mil_sum": mil * n,
            "n_correct": n_correct,
            "n": n,
        }

    return jax.jit(eval_fn)


def put_batch(batch: VQABatch, mesh) -> VQABatch:
    """Place a batch with its leading dim sharded over the data axis.

    Single-process: a plain device_put. Multi-host: each process holds its
    local shard (the loader already strides samples by process, replacing
    ``DistributedSampler``), and the global array is assembled per-leaf.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def adam(lr: float = 1e-4, warmup_steps: int = 0) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (`main:206`): betas (0.9, 0.999), eps 1e-8.

    ``warmup_steps`` > 0 ramps the LR linearly from 0 before holding the
    reference's constant LR — an opt-in stabilizer the reference lacks."""
    if warmup_steps:
        sched = optax.linear_schedule(0.0, lr, warmup_steps)
        return optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

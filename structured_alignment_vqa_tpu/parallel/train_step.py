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


def create_train_state(
    model,
    rng,
    sample_batch: VQABatch,
    tx: optax.GradientTransformation,
    sparse_table: bool = False,
    table_moments_dtype=jnp.float32,
) -> TrainState:
    """``sparse_table``: the shared GloVe table's Adam state moves out of the
    optax tree into a :class:`sparse_table.TableOpt` (opt_state becomes the
    pair ``(tx_state, table_opt)``); the optax state then holds a zero-size
    stub at the table path, so dense moments are never allocated for it."""
    variables = model.init(rng, sample_batch)
    params = variables["params"]
    constants = dict(variables.get("constants", {}))
    if sparse_table:
        from structured_alignment_vqa_tpu.parallel.sparse_table import (
            TABLE_PATH,
            init_table_opt,
        )

        if TABLE_PATH[0] not in params:
            raise ValueError(
                "sparse_table requires the shared GloVe table "
                "(ModelConfig.share_glove / --share_glove): without sharing, "
                "each encoder owns its own embedding and there is no single "
                f"{'/'.join(TABLE_PATH)} param to segment the optimizer over"
            )
        table = _tree_get(params, TABLE_PATH)
        stub = _tree_set(params, TABLE_PATH, _empty_like(table))
        opt_state = (tx.init(stub), init_table_opt(table, table_moments_dtype))
    else:
        opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        constants=constants,
    )


def _tree_get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _tree_set(tree, path, value):
    if not path:
        return value
    new = dict(tree)
    new[path[0]] = _tree_set(tree[path[0]], path[1:], value)
    return new


def _empty_like(table):
    """One-row stand-in keeping the param-tree structure (and therefore the
    optax state structure) identical while costing optax one row of moments
    instead of 407k. One row, not zero: orbax refuses zero-size arrays at
    checkpoint save."""
    return jnp.zeros((1,) + table.shape[1:], table.dtype)


def shard_state(state: TrainState, mesh) -> TrainState:
    """Lay the state out on the mesh.

    Params follow the sharding rules; optimizer-state subtrees that mirror the
    param tree (Adam's mu/nu) follow the same rules so a sharded table's
    moments live next to it; everything else (step counters) is replicated.

    Sparse-table states (opt_state = ``(tx_state, TableOpt)``) REPLICATE the
    GloVe table instead of row-sharding it over the model axis: the sparse
    step gathers/scatters dynamic ``uids`` rows every step, and under a
    row-sharded operand GSPMD lowers those to full-table all-gathers —
    500 MB/step at the production point, erasing the path's entire purpose.
    The table is the one array whose *optimizer traffic* (not its residency)
    is the bottleneck; its dense moments stay host-replicated alongside.
    This also keeps the 1-row optax stub at the table path placeable (the
    row-shard rule cannot apply to a 1-row array).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rules = param_sharding_rules(state.params, mesh)
    rep = NamedSharding(mesh, P())
    if isinstance(state.opt_state, tuple) and len(state.opt_state) == 2:
        from structured_alignment_vqa_tpu.parallel.sparse_table import (
            TABLE_PATH,
            TableOpt,
        )

        if isinstance(state.opt_state[1], TableOpt):
            rules = _tree_set(rules, TABLE_PATH, rep)

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
    sparse_table: bool = False,
    table_lr: float = 1e-4,
    table_warmup_steps: int = 0,
) -> Callable:
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    ``skip_nonfinite``: when a step produces any non-finite gradient the
    update is dropped (params/opt state unchanged) and ``metrics['skipped']``
    is 1 — failure containment the reference lacks entirely (SURVEY.md section 5.3;
    its only guard was `torch.autograd.set_detect_anomaly`, a debugger).

    ``sparse_table``: update only the GloVe-table rows the batch touches
    (`parallel/sparse_table.py`): the forward runs on a compacted (U, 300)
    row block so the gradient never materializes at table size, and Adam
    gathers/scatters the touched rows. Requires ``cfg.share_glove`` and a
    state built with ``create_train_state(..., sparse_table=True)``;
    ``table_lr``/``table_warmup_steps`` must repeat the schedule ``tx`` was
    built with (the table no longer flows through ``tx``)."""
    if sparse_table:
        if not cfg.share_glove:
            raise ValueError("sparse_table requires cfg.share_glove (one table)")
        if cfg.int8_serving:
            raise ValueError("sparse_table is a training path; int8 is serving-only")
        from structured_alignment_vqa_tpu.parallel.sparse_table import (
            TABLE_PATH,
            remap_batch,
            sparse_adam_update,
        )

    def loss_and_metrics(apply_model, params, batch, constants, dropout_rng):
        variables = {"params": params}
        if constants:
            variables["constants"] = constants
        lc, lv, ls_, mil_obj, mil_rel = apply_model.apply(
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

    def finish(state, metrics, grads, do_update, identity_operand):
        """Shared skip-nonfinite guard + state assembly."""
        if skip_nonfinite:
            finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
            ))
            # lax.cond (not jnp.where over every leaf): the common finite
            # path pays only the Adam update — the per-leaf selects cost a
            # full extra read+write pass over params AND opt state (~8 ms
            # at the bs-128 production point, docs/DESIGN.md round-3 MFU).
            new_params, new_opt_state = jax.lax.cond(
                finite, do_update, lambda op: identity_operand, grads
            )
            metrics["skipped"] = 1.0 - finite.astype(jnp.float32)
        else:
            new_params, new_opt_state = do_update(grads)
        return state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        ), metrics

    def step_fn(state: TrainState, batch: VQABatch, rng: jax.Array):
        batch = as_vqa_batch(batch)  # wire-format batches unpack in-jit (data/wire.py)
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return loss_and_metrics(model, params, batch, state.constants, dropout_rng)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        def do_update(grads):
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            return optax.apply_updates(state.params, updates), new_opt

        return finish(state, metrics, grads, do_update,
                      (state.params, state.opt_state))

    def sparse_step_fn(state: TrainState, batch: VQABatch, rng: jax.Array):
        batch = as_vqa_batch(batch)
        dropout_rng = jax.random.fold_in(rng, state.step)

        table = _tree_get(state.params, TABLE_PATH)
        rbatch, uids, valid = remap_batch(batch, cfg)
        # The model runs unchanged over the compacted block: same module
        # code, the table is just U rows tall and the batch's ids are block
        # positions. Autodiff therefore scatters gradients into U rows.
        model_u = model.clone(cfg=cfg.replace(vocab_size=int(uids.shape[0])))
        rows = jnp.take(table, uids, axis=0)
        diff_params = _tree_set(state.params, TABLE_PATH, rows)

        def loss_fn(params):
            return loss_and_metrics(model_u, params, rbatch, state.constants, dropout_rng)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(diff_params)

        rows_grad = _tree_get(grads, TABLE_PATH)
        grads_rest = _tree_set(grads, TABLE_PATH, _empty_like(table))
        params_rest = _tree_set(state.params, TABLE_PATH, _empty_like(table))
        tx_state, topt = state.opt_state

        finite = None
        if skip_nonfinite:
            finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
            ))
            metrics["skipped"] = 1.0 - finite.astype(jnp.float32)

        # The table/moment update runs OUTSIDE the skip guard's lax.cond with
        # masked deltas (``apply=finite``): a cond whose identity branch
        # returns the original buffers defeats input-output aliasing, and the
        # "sparse" path then copies the full table + both moment tables every
        # step (measured ~15 ms — docs/DESIGN.md round-4).
        new_table, new_topt = sparse_adam_update(
            table, topt, rows_grad, uids, valid,
            table_lr, table_warmup_steps, apply=finite,
        )

        def do_update(_):
            updates, new_tx = tx.update(grads_rest, tx_state, params_rest)
            return optax.apply_updates(params_rest, updates), new_tx

        if skip_nonfinite:
            new_rest, new_tx = jax.lax.cond(
                finite, do_update, lambda _: (params_rest, tx_state), grads_rest
            )
        else:
            new_rest, new_tx = do_update(grads_rest)

        return state.replace(
            step=state.step + 1,
            params=_tree_set(new_rest, TABLE_PATH, new_table),
            opt_state=(new_tx, new_topt),
        ), metrics

    return jax.jit(sparse_step_fn if sparse_table else step_fn, donate_argnums=(0,))


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

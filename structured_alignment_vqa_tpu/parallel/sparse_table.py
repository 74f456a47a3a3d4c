"""Sparse/segmented optimizer for the 407k x 300 GloVe table.

Train-step MFU at the bs-128 obj-only production point is bound by the
embedding table, not the MXU: the dense scatter-add gradient costs 11.3 ms and
dense Adam's 7-pass traffic over 863 MB of f32 moments costs 17.7 ms
(docs/DESIGN.md "train-step MFU, measured and attributed") — while a batch
looks up only ~10-20k distinct rows. This module updates exactly the rows a
batch touches:

1. the batch's GloVe-id fields are flattened and deduplicated at static size
   U = the batch's total id-slot count (overflow impossible) — by dense
   bitmap + prefix-sum ranking, NOT a sort: ``jnp.unique`` costs ~9 ms at
   the production point on v5e (see ``_dedup_ids``);
2. the step gathers those rows into a dense (U, 300) block and remaps the
   batch's id fields to block positions — the model then runs UNCHANGED with
   the block as its table (a `.clone` with ``vocab_size=U``), so autodiff
   produces a (U, 300) gradient: a scatter-add over the gather sites into U
   rows instead of 407k;
3. Adam moments for the table stay dense in HBM but are read and written only
   at the touched rows (gather -> moment update -> masked scatter-add of
   deltas; padded/duplicate slots contribute exact zeros).

Semantics are ``torch.optim.SparseAdam``'s "lazy" Adam: untouched rows do not
decay their moments between touches. Dense Adam (the reference regime,
`main_itp_ddp_tar_super_node.py:206`) *does* keep moving untouched rows while
their momentum decays, so the trajectories deviate once a row goes untouched
with momentum in flight. The first update from fresh moments is exact, and
`tests/test_sparse_table.py` bounds the 20-step deviation — which is why the
path is opt-in (``--sparse_table``) rather than the silent default.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Parameter path of the shared GloVe table (requires ModelConfig.share_glove;
# the reference's three-copy layout would triple the win but the production
# runs here share one table).
TABLE_PATH = ("glove", "table")

# Batch fields embedded through the shared GloVe table (`models/att_model_x3.py`:
# the two encoder bodies consume q_ipt; MILNCEModule consumes macro_ipt and the
# micro object candidates; micro_pos_rel only when the relation branch runs.
# micro_neg_rel is never embedded — the reference scores negatives with the
# bilinear head only, `AttModel_x3.py:382-439`).
_ID_FIELDS = ("q_ipt", "macro_ipt", "micro_pos_obj", "micro_neg_obj")
_REL_ID_FIELDS = ("micro_pos_rel",)


def table_id_fields(only_obj: bool) -> tuple:
    return _ID_FIELDS + (() if only_obj else _REL_ID_FIELDS)


def _dedup_ids(flat: jax.Array, vocab_size: int):
    """Static-size dedup WITHOUT a sort: presence bitmap + prefix-sum ranks.

    ``jnp.unique(size=U)`` costs ~9 ms at the production point (TPU sorts are
    slow; measured on v5e, S=80k — docs/DESIGN.md round-4). The vocab is small
    enough to rank densely instead: scatter a presence bit per id, cumsum the
    (V,) bitmap, and each id's dense rank is its compacted slot — O(V) cumsum
    traffic (1.6 MB) plus two O(S) gathers/scatters, no sort anywhere.

    Returns (uids, inverse, valid): ``uids`` sorted-ascending unique ids
    padded at the tail with ``vocab_size - 1``; ``inverse`` maps each input
    slot to its uid slot; ``valid`` marks the distinct-id slots.
    """
    s = flat.shape[0]
    present = jnp.zeros((vocab_size,), jnp.int32).at[flat].set(1)
    rank = jnp.cumsum(present)          # monotone in id -> uids comes out sorted
    n_unique = rank[-1]
    pos = rank[flat] - 1                # (S,) compacted slot per input element
    uids = jnp.full((s,), vocab_size - 1, flat.dtype).at[pos].set(flat)
    valid = jnp.arange(s) < n_unique
    return uids, pos, valid


def remap_batch(batch, cfg) -> Tuple[object, jax.Array, jax.Array]:
    """Dedup the batch's GloVe ids; remap id fields to row-block positions.

    Returns ``(remapped_batch, uids, valid)`` where ``uids`` is the sorted
    (U,) unique-id array (U = total id slots, so overflow is impossible;
    tail padded with ``vocab_size - 1``), ``valid`` the distinct-slot mask,
    and every id field of ``remapped_batch`` indexes into the (U, D) row
    block ``table[uids]``.
    """
    fields = table_id_fields(cfg.only_obj)
    parts = [getattr(batch, f) for f in fields]
    # clip defensively: the embedded id fields carry PAD=400000, never -1,
    # but an out-of-range id would silently drop from the scatter below
    flat = jnp.clip(
        jnp.concatenate([p.reshape(-1) for p in parts]), 0, cfg.vocab_size - 1
    )
    uids, inv, valid = _dedup_ids(flat, cfg.vocab_size)
    out = {}
    off = 0
    for f, p in zip(fields, parts):
        n = int(np.prod(p.shape))
        out[f] = inv[off : off + n].reshape(p.shape).astype(p.dtype)
        off += n
    return batch.replace(**out), uids, valid


@struct.dataclass
class TableOpt:
    """Adam state for the sparsely-updated table.

    ``count`` mirrors optax's update counter (skipped non-finite steps do not
    increment it, matching the dense path where the whole update is dropped).
    ``mu``/``nu`` stay dense in HBM — (V, D) in ``moments_dtype`` — but each
    step only gathers/scatters the touched rows.
    """

    count: jax.Array
    mu: jax.Array
    nu: jax.Array


def init_table_opt(table: jax.Array, moments_dtype=jnp.float32) -> TableOpt:
    return TableOpt(
        count=jnp.zeros((), jnp.int32),
        mu=jnp.zeros(table.shape, moments_dtype),
        nu=jnp.zeros(table.shape, moments_dtype),
    )


def sparse_adam_update(
    table: jax.Array,
    topt: TableOpt,
    rows_grad: jax.Array,
    uids: jax.Array,
    valid: jax.Array,
    lr: float,
    warmup_steps: int = 0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    apply: "jax.Array | None" = None,
) -> Tuple[jax.Array, TableOpt]:
    """One lazy-Adam update over the touched rows.

    Matches ``optax.adam`` exactly on the touched rows from fresh moments
    (same bias correction, eps outside the sqrt — `train_step.py:adam`);
    untouched rows are left alone entirely (the "lazy" deviation documented
    in the module docstring). All scatter writes are masked deltas, so the
    duplicate padding slots contribute exact zeros.

    ``apply``: optional scalar bool — False zeroes every delta and freezes
    the count (the skip-nonfinite guard). This is deliberately NOT a
    ``lax.cond``: an identity branch returning the original table/moments
    defeats XLA's input-output buffer aliasing, and the "sparse" update then
    pays a full copy of the 407k x 300 table AND both moment tables every
    step (~15 ms at the production point — measured, docs/DESIGN.md
    round-4). A masked always-run scatter keeps the buffers donated and
    costs only the touched rows. Deltas go through ``where`` (not ``* 0``)
    so non-finite gradients cannot poison the zero path.
    """
    do = jnp.asarray(True) if apply is None else apply
    count = topt.count + do.astype(topt.count.dtype)
    lr_t = jnp.asarray(lr, jnp.float32)
    if warmup_steps:
        # optax.linear_schedule(0, lr, warmup) evaluated at the pre-update
        # count — the first update uses lr 0, exactly like the dense path.
        lr_t = lr_t * jnp.clip(topt.count.astype(jnp.float32) / warmup_steps, 0.0, 1.0)

    vm = valid[:, None]
    g = rows_grad.astype(jnp.float32) * vm
    mu_rows = jnp.take(topt.mu, uids, axis=0).astype(jnp.float32)
    nu_rows = jnp.take(topt.nu, uids, axis=0).astype(jnp.float32)
    new_mu = b1 * mu_rows + (1.0 - b1) * g
    new_nu = b2 * nu_rows + (1.0 - b2) * g * g
    t = count.astype(jnp.float32)
    mu_hat = new_mu / (1.0 - b1**t)
    nu_hat = new_nu / (1.0 - b2**t)
    upd = lr_t * mu_hat / (jnp.sqrt(nu_hat) + eps)

    def masked(delta):
        return jnp.where(do, jnp.where(vm, delta, 0.0), 0.0)

    new_table = table.at[uids].add(masked(-upd).astype(table.dtype))
    mu_out = topt.mu.at[uids].add(masked(new_mu - mu_rows).astype(topt.mu.dtype))
    nu_out = topt.nu.at[uids].add(masked(new_nu - nu_rows).astype(topt.nu.dtype))
    return new_table, TableOpt(count=count, mu=mu_out, nu=nu_out)

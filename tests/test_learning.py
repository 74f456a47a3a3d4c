"""Learning-dynamics validation: the full training step must be able to fit.

Nothing else in the suite proves the model can actually *learn* — gradients
flowing and losses finite is necessary, not sufficient. Overfit one fixed
batch: CE must collapse and train accuracy must reach 1.0. (The reference
never had such a check; its only signal was cloud-run loss curves.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import tiny_test_config
from structured_alignment_vqa_tpu.parallel import create_train_state, make_train_step, make_eval_step
from structured_alignment_vqa_tpu.parallel.train_step import adam


def test_overfits_single_batch():
    cfg = tiny_test_config(dropout_rate=0.0)
    model = AttModelX3(cfg)
    batch = synthetic_batch(cfg, batch=8, lv=4, lq=5, ls=10, seed=21)
    # non-degenerate answers (at least two classes, none zero so accuracy counts)
    batch = batch.replace(answer=jnp.asarray([1, 2, 3, 4, 1, 2, 3, 4], jnp.int32))

    tx = adam(3e-3)
    state = create_train_state(model, jax.random.key(0), batch, tx)
    step = make_train_step(model, tx, cfg, with_milnce=True)
    ev = make_eval_step(model, cfg, with_milnce=False)
    rng = jax.random.key(5)

    first_ce = None
    for i in range(150):
        state, m = step(state, batch, rng)
        if first_ce is None:
            first_ce = float(m["ce"])
    last_ce = float(m["ce"])

    metrics = ev(state, batch)
    acc = float(metrics["n_correct"]) / float(metrics["n"])
    assert last_ce < first_ce * 0.2, (first_ce, last_ce)
    assert acc == 1.0, f"failed to overfit: acc={acc}, ce {first_ce}->{last_ce}"

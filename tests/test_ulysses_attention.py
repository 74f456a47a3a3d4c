"""Ulysses (all-to-all head-sharded) sequence parallelism vs the
single-device paths and the ppermute ring (VERDICT r2 item 9).

Same layout contract as the ring — (B, L, C) global arrays, sequence sharded
over 'seq' — so the two are drop-in interchangeable; parity bounds match the
ring tests' (the head-sharded kernel reassociates nothing across devices, so
Ulysses is actually bit-closer to the single-device kernel than the ring is).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from structured_alignment_vqa_tpu.ops.attention import attention_core
from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
    flash_graph_attention,
)
from structured_alignment_vqa_tpu.ops.ulysses_attention import (
    ulysses_graph_attention,
)
from tests.test_ring_attention import make_inputs, seq_mesh


class TestUlyssesAttention:
    @pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
    @pytest.mark.parametrize("n_dev", [2, 4])
    def test_matches_composite(self, rng, renorm, n_dev):
        q, k, v, km, qm, graph = make_inputs(rng, b=2, l=32, c=16)
        mesh = seq_mesh(n_dev)
        got = jax.jit(lambda *a: ulysses_graph_attention(
            *a, 4, renorm, mesh=mesh, q_tile=8, k_tile=8, interpret=True
        ))(q, k, v, km, qm, graph)
        want, _ = attention_core(
            q, k, v, key_mask=km, query_mask=qm, num_heads=4,
            graph=graph, renorm=renorm,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    def test_production_length_matches_flash(self, rng):
        """L=1536 over 8 shards (8 heads -> 1 head per device) vs the
        single-device flash kernel."""
        b, l, c, h = 1, 1536, 32, 8
        q, k, v, km, qm, graph = make_inputs(rng, b=b, l=l, c=c, pad_tail=40)
        mesh = seq_mesh(8)
        got = jax.jit(lambda *a: ulysses_graph_attention(
            *a, h, "l1", mesh=mesh, q_tile=64, k_tile=512, interpret=True
        ))(q, k, v, km, qm, graph)
        want = flash_graph_attention(
            q, k, v, km, qm, graph, h, "l1", q_tile=64, k_tile=512,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    @pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
    def test_gradients_match_composite(self, rng, renorm):
        q, k, v, km, qm, graph = make_inputs(rng, b=2, l=32, c=16)
        graph = graph.at[0, 3, :].set(0.0)  # dead row
        mesh = seq_mesh(4)

        def f(q, k, v):
            return jnp.sum(ulysses_graph_attention(
                q, k, v, km, qm, graph, 4, renorm, mesh=mesh,
                q_tile=8, k_tile=8, interpret=True) ** 2)

        def g_(q, k, v):
            out, _ = attention_core(
                q, k, v, key_mask=km, query_mask=qm, num_heads=4,
                graph=graph, renorm=renorm,
            )
            return jnp.sum(out ** 2)

        ga = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
        gb = jax.grad(g_, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("qkv", ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-5, err_msg=f"d{name}"
            )

    def test_indivisible_length_raises(self, rng):
        q, k, v, km, qm, graph = make_inputs(rng, b=1, l=30, c=16)
        with pytest.raises(ValueError, match="divisible"):
            ulysses_graph_attention(q, k, v, km, qm, graph, 4, "l1",
                                    mesh=seq_mesh(4))

    def test_head_count_raises(self, rng):
        q, k, v, km, qm, graph = make_inputs(rng, b=1, l=32, c=16)
        with pytest.raises(ValueError, match="heads"):
            ulysses_graph_attention(q, k, v, km, qm, graph, 2, "l1",
                                    mesh=seq_mesh(4))

    def test_train_step_ulysses_matches_single_device(self, rng):
        """seq_impl='ulysses' inside the full jitted train step on a
        (data=2, seq=2) mesh vs the same step single-device."""
        from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
        from structured_alignment_vqa_tpu.models import AttModelX3
        from structured_alignment_vqa_tpu.models.config import tiny_test_config
        from structured_alignment_vqa_tpu.parallel import (
            create_train_state, make_mesh, make_train_step,
        )
        from structured_alignment_vqa_tpu.parallel.context import use_mesh
        from structured_alignment_vqa_tpu.parallel.train_step import (
            adam, put_batch, shard_state,
        )
        from tests.test_train_step import perturb_params

        def fresh():
            cfg = tiny_test_config(seq_axis="seq", seq_impl="ulysses")
            model = AttModelX3(cfg)
            batch = synthetic_batch(cfg, batch=4, lv=4, lq=4, ls=12, seed=7)
            tx = adam(1e-3)
            state = create_train_state(model, jax.random.key(0), batch, tx)
            state = state.replace(params=perturb_params(state.params))
            return cfg, model, batch, tx, state

        cfg, model, batch, tx, state = fresh()
        step1 = make_train_step(model, tx, cfg)
        new_1, m_1 = step1(state, batch, jax.random.key(5))

        cfg, model, batch, tx, state = fresh()
        mesh = make_mesh(4, seq_parallel=2)
        step2 = make_train_step(model, tx, cfg)
        with use_mesh(mesh):
            new_2, m_2 = step2(
                shard_state(state, mesh), put_batch(batch, mesh),
                jax.random.key(5),
            )
        np.testing.assert_allclose(
            float(m_2["loss"]), float(m_1["loss"]), atol=1e-5
        )
        a = jax.tree.leaves(new_1.params)[0]
        b_ = jax.tree.leaves(new_2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    def test_data_and_seq_sharded(self, rng):
        q, k, v, km, qm, graph = make_inputs(rng, b=4, l=32, c=16)
        devs = np.asarray(jax.devices()).reshape(2, 4)
        mesh = Mesh(devs, ("data", "seq"))
        got = jax.jit(lambda *a: ulysses_graph_attention(
            *a, 4, "l1", mesh=mesh, q_tile=8, k_tile=8, interpret=True
        ))(q, k, v, km, qm, graph)
        want, _ = attention_core(
            q, k, v, key_mask=km, query_mask=qm, num_heads=4,
            graph=graph, renorm="l1",
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

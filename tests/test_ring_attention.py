"""Ring (sequence-sharded) graph attention vs the single-device paths.

Covers VERDICT r2 items 1+2: (a) the existing flash fwd+bwd under shard_map
with a sharded batch axis, (b) the ppermute ring over sequence shards at the
production obj+rel length (L=1536) on the virtual 8-device CPU mesh, values
and gradients, both renorm variants. Parity is a few f32 ulps, not bit-exact:
the ring reassociates the online-softmax sums across shards (see the module
docstring of `ops/ring_attention.py`).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from structured_alignment_vqa_tpu.ops.attention import attention_core, content_mask
from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
    flash_graph_attention,
)
from structured_alignment_vqa_tpu.ops.ring_attention import (
    ring_graph_attention,
)


def make_inputs(rng, b=2, l=32, c=16, pad_tail=2):
    x = rng.standard_normal((b, l, c)).astype(np.float32)
    if pad_tail:
        x[0, -pad_tail:] = 0.0  # padding rows
    q = jnp.asarray(np.maximum(x * 0.5 + 0.1, 0))
    k = jnp.asarray(np.maximum(x * 0.3 - 0.05, 0))
    v = jnp.asarray(np.maximum(x, 0))
    km = content_mask(jnp.asarray(x))
    qm = content_mask(jnp.asarray(x))
    graph = jnp.asarray((rng.random((b, l, l)) > 0.4).astype(np.float32))
    return q, k, v, km, qm, graph


def seq_mesh(n):
    devs = jax.devices()
    assert len(devs) >= n
    return Mesh(np.asarray(devs[:n]).reshape(1, n), ("data", "seq"))


class TestFlashUnderShardMap:
    """The existing flash kernel composed with GSPMD/shard_map (batch axis)."""

    def test_fwd_bwd_batch_sharded(self, rng):
        q, k, v, km, qm, graph = make_inputs(rng, b=4, l=20, c=16)
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))

        def f(q, k, v, km, qm, graph):
            out = flash_graph_attention(
                q, k, v, km, qm, graph, 2, "l1", q_tile=8, k_tile=8,
                interpret=True,
            )
            dq = jax.grad(lambda q_: jnp.sum(flash_graph_attention(
                q_, k, v, km, qm, graph, 2, "l1", q_tile=8, k_tile=8,
                interpret=True) ** 2))(q)
            return out, dq

        sharded = jax.jit(jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("data"),) * 6, out_specs=(P("data"), P("data")),
            check_vma=False,
        ))
        out_s, dq_s = sharded(q, k, v, km, qm, graph)
        out_1, dq_1 = f(q, k, v, km, qm, graph)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(dq_s), np.asarray(dq_1),
                                   atol=1e-5)

    def test_train_step_pallas_batch_sharded(self, rng):
        """The full jitted train step with use_pallas_attention=True on a
        2-device data mesh — kernel+GSPMD composition inside the real model
        (VERDICT r2 weak #4)."""
        import structured_alignment_vqa_tpu.ops.pallas_attention as pa
        from tests.test_train_step import setup
        from structured_alignment_vqa_tpu.parallel.mesh import make_mesh
        from structured_alignment_vqa_tpu.parallel.train_step import (
            adam, make_train_step, put_batch, shard_state,
        )

        pa.INTERPRET_MODE = True
        try:
            cfg, model, batch, tx, state = setup(
                batch_size=4, use_pallas_attention=True
            )
            step = make_train_step(model, tx, cfg)
            new_1, metrics_1 = step(state, batch, jax.random.key(1))

            # fresh state: the step donates its input buffers
            cfg, model, batch, tx, state = setup(
                batch_size=4, use_pallas_attention=True
            )
            mesh = make_mesh(n_devices=2)
            state_m = shard_state(state, mesh)
            batch_m = put_batch(batch, mesh)
            new_m, metrics_m = step(state_m, batch_m, jax.random.key(1))
            np.testing.assert_allclose(
                float(metrics_m["loss"]), float(metrics_1["loss"]), atol=1e-5
            )
            a = jax.tree.leaves(new_m.params)[0]
            b_ = jax.tree.leaves(new_1.params)[0]
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
        finally:
            pa.INTERPRET_MODE = False


class TestRingAttention:
    @pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_matches_composite(self, rng, renorm, n_dev):
        q, k, v, km, qm, graph = make_inputs(rng, b=2, l=32, c=16)
        mesh = seq_mesh(n_dev)
        got = jax.jit(lambda *a: ring_graph_attention(
            *a, 4, renorm, mesh=mesh, q_tile=8, k_tile=8, interpret=True
        ))(q, k, v, km, qm, graph)
        want, _ = attention_core(
            q, k, v, key_mask=km, query_mask=qm, num_heads=4,
            graph=graph, renorm=renorm,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    @pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
    def test_production_length_matches_flash(self, rng, renorm):
        """L=1536 (the obj+rel operating point) over 8 sequence shards vs the
        single-device flash kernel."""
        b, l, c, h = 1, 1536, 32, 2
        q, k, v, km, qm, graph = make_inputs(rng, b=b, l=l, c=c, pad_tail=40)
        mesh = seq_mesh(8)
        got = jax.jit(lambda *a: ring_graph_attention(
            *a, h, renorm, mesh=mesh, q_tile=64, k_tile=192, interpret=True
        ))(q, k, v, km, qm, graph)
        want = flash_graph_attention(
            q, k, v, km, qm, graph, h, renorm, q_tile=64, k_tile=512,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-6,
        )

    @pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
    def test_gradients_match_composite(self, rng, renorm):
        q, k, v, km, qm, graph = make_inputs(rng, b=2, l=32, c=16)
        graph = graph.at[0, 3, :].set(0.0)  # dead row crosses a shard
        mesh = seq_mesh(4)

        def f(q, k, v):
            return jnp.sum(ring_graph_attention(
                q, k, v, km, qm, graph, 2, renorm, mesh=mesh,
                q_tile=8, k_tile=8, interpret=True) ** 2)

        def g_(q, k, v):
            out, _ = attention_core(
                q, k, v, key_mask=km, query_mask=qm, num_heads=2,
                graph=graph, renorm=renorm,
            )
            return jnp.sum(out ** 2)

        ga = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
        gb = jax.grad(g_, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("qkv", ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-5, err_msg=f"d{name}"
            )

    def test_gradients_production_length(self, rng):
        """Gradient parity at L=1536 over 8 shards vs the flash kernel's
        hand-derived backward."""
        b, l, c, h = 1, 1536, 16, 2
        q, k, v, km, qm, graph = make_inputs(rng, b=b, l=l, c=c, pad_tail=40)
        mesh = seq_mesh(8)

        def f(q, k, v):
            return jnp.sum(ring_graph_attention(
                q, k, v, km, qm, graph, h, "l1", mesh=mesh,
                q_tile=64, k_tile=192, interpret=True) ** 2)

        def g_(q, k, v):
            return jnp.sum(flash_graph_attention(
                q, k, v, km, qm, graph, h, "l1", q_tile=64, k_tile=512,
                interpret=True) ** 2)

        ga = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
        gb = jax.grad(g_, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("qkv", ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-5, err_msg=f"d{name}"
            )

    def test_masked_shard(self, rng):
        """An entirely-padding sequence shard (the tail of a short sample)
        must contribute nothing, exactly like a masked K tile."""
        b, l, c = 1, 32, 16
        x = rng.standard_normal((b, l, c)).astype(np.float32)
        x[0, 16:] = 0.0  # shards 2..3 of 4 are all padding
        q = jnp.asarray(np.maximum(x, 0) + 0.1 * (np.arange(l)[None, :, None] < 16))
        km = content_mask(jnp.asarray(x))
        qm = content_mask(jnp.asarray(x))
        graph = jnp.ones((b, l, l), jnp.float32)
        mesh = seq_mesh(4)
        got = jax.jit(lambda *a: ring_graph_attention(
            *a, 2, "l1", mesh=mesh, q_tile=8, k_tile=8, interpret=True
        ))(q, q, q, km, qm, graph)
        want, _ = attention_core(
            q, q, q, key_mask=km, query_mask=qm, num_heads=2,
            graph=graph, renorm="l1",
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    def test_indivisible_length_raises(self, rng):
        q, k, v, km, qm, graph = make_inputs(rng, b=1, l=30, c=16)
        mesh = seq_mesh(4)
        with pytest.raises(ValueError, match="divisible"):
            ring_graph_attention(q, k, v, km, qm, graph, 2, "l1", mesh=mesh)

    def test_train_step_ring_matches_single_device(self, rng):
        """The full jitted train step with seq_axis='seq' on a (data=2, seq=2)
        mesh vs the same step single-device: identical metrics and update."""
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
            # lv+lq = 8 and ls+lq = 16: both encoder lengths divide seq=2
            cfg = tiny_test_config(seq_axis="seq")
            model = AttModelX3(cfg)
            batch = synthetic_batch(cfg, batch=4, lv=4, lq=4, ls=12, seed=7)
            tx = adam(1e-3)
            state = create_train_state(model, jax.random.key(0), batch, tx)
            state = state.replace(params=perturb_params(state.params))
            return cfg, model, batch, tx, state

        cfg, model, batch, tx, state = fresh()
        step1 = make_train_step(model, tx, cfg)
        new_1, m_1 = step1(state, batch, jax.random.key(5))  # no ambient mesh -> no ring

        cfg, model, batch, tx, state = fresh()
        mesh = make_mesh(4, seq_parallel=2)
        assert mesh.shape["data"] == 2 and mesh.shape["seq"] == 2
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
        """Both mesh axes live: batch over data=2, sequence over seq=4."""
        q, k, v, km, qm, graph = make_inputs(rng, b=4, l=32, c=16)
        devs = np.asarray(jax.devices()).reshape(2, 4)
        mesh = Mesh(devs, ("data", "seq"))
        got = jax.jit(lambda *a: ring_graph_attention(
            *a, 2, "l1", mesh=mesh, q_tile=8, k_tile=8, interpret=True
        ))(q, k, v, km, qm, graph)
        want, _ = attention_core(
            q, k, v, key_mask=km, query_mask=qm, num_heads=2,
            graph=graph, renorm="l1",
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

"""Fused Pallas graph-attention: interpreter-mode parity vs the composite op."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import structured_alignment_vqa_tpu.ops.pallas_attention as pa
from structured_alignment_vqa_tpu.ops.attention import attention_core, content_mask


@pytest.fixture(autouse=True)
def interpret_mode():
    pa.INTERPRET_MODE = True
    yield
    pa.INTERPRET_MODE = False


def make_inputs(rng, b=2, l=9, c=16):
    x = rng.standard_normal((b, l, c)).astype(np.float32)
    x[0, -2:] = 0.0  # padding rows
    q = jnp.asarray(jax.nn.relu(jnp.asarray(x) * 0.5 + 0.1))
    k = jnp.asarray(jax.nn.relu(jnp.asarray(x) * 0.3 - 0.05))
    v = jnp.asarray(jax.nn.relu(jnp.asarray(x)))
    km = content_mask(jnp.asarray(x))
    qm = content_mask(jnp.asarray(x))
    graph = jnp.asarray((rng.random((b, l, l)) > 0.4).astype(np.float32))
    return q, k, v, km, qm, graph


@pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
@pytest.mark.parametrize("num_heads", [2, 4])
def test_fused_matches_composite(rng, renorm, num_heads):
    q, k, v, km, qm, graph = make_inputs(rng)
    got = pa.fused_graph_attention(q, k, v, km, qm, graph, num_heads, renorm)
    want, _ = attention_core(
        q, k, v, key_mask=km, query_mask=qm, num_heads=num_heads,
        graph=graph, renorm=renorm,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_unaligned_length_padding_exact(rng):
    # L=130 crosses one lane boundary; padding must not perturb results
    q, k, v, km, qm, graph = make_inputs(rng, b=1, l=130, c=32)
    got = pa.fused_graph_attention(q, k, v, km, qm, graph, 4, "l1")
    want, _ = attention_core(
        q, k, v, key_mask=km, query_mask=qm, num_heads=4, graph=graph, renorm="l1"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_match_composite(rng):
    q, k, v, km, qm, graph = make_inputs(rng)

    def f_fused(q, k, v):
        return jnp.sum(pa.fused_graph_attention(q, k, v, km, qm, graph, 2, "l1") ** 2)

    def f_comp(q, k, v):
        out, _ = attention_core(
            q, k, v, key_mask=km, query_mask=qm, num_heads=2, graph=graph, renorm="l1"
        )
        return jnp.sum(out ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_comp, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
def test_kernel_backward_matches_composite(rng, renorm):
    """Hand-derived backward kernel vs XLA autodiff of the composite+LN,
    including padding rows, zero-graph rows, and the LN variance guard."""
    from structured_alignment_vqa_tpu.ops.pallas_attention import (
        _composite_ln,
        fused_graph_attention_ln,
    )

    b, l, c, h = 2, 9, 16, 4
    q, k, v, km, qm, graph = make_inputs(rng, b=b, l=l, c=c)
    graph = graph.at[0, 3, :].set(0.0)  # fully-disconnected row
    residual = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))

    def f_fused(q, k, v, residual, gamma, beta):
        return jnp.sum(fused_graph_attention_ln(
            q, k, v, km, qm, graph, residual, gamma, beta, h, renorm) ** 2)

    def f_comp(q, k, v, residual, gamma, beta):
        return jnp.sum(_composite_ln(
            q, k, v, km, qm, graph, residual, gamma, beta, h, renorm) ** 2)

    args = (q, k, v, residual, gamma, beta)
    ga = jax.grad(f_fused, argnums=tuple(range(6)))(*args)
    gb = jax.grad(f_comp, argnums=tuple(range(6)))(*args)
    for name, a, b_ in zip(("dq", "dk", "dv", "dres", "dgamma", "dbeta"), ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, err_msg=name
        )


def test_fused_ffn_matches_composite(rng):
    from structured_alignment_vqa_tpu.ops.pallas_ffn import fused_ffn, _composite

    b, l, c, h = 2, 9, 16, 64
    x = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((c, h)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((h, c)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    got = fused_ffn(x, w1, b1, w2, b2, gamma, beta)
    want = _composite(x, w1, b1, w2, b2, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # gradients via the composite backward
    f = lambda *a: jnp.sum(fused_ffn(*a) ** 2)
    g = lambda *a: jnp.sum(_composite(*a) ** 2)
    ga = jax.grad(f, argnums=(0, 1, 4))(x, w1, b1, w2, b2, gamma, beta)
    gb = jax.grad(g, argnums=(0, 1, 4))(x, w1, b1, w2, b2, gamma, beta)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_ffn_module_pallas_parity(rng):
    from structured_alignment_vqa_tpu.ops.layers import FeedForward

    x = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    m1 = FeedForward(16, (64, 16), use_pallas=True)
    m2 = FeedForward(16, (64, 16), use_pallas=False)
    p = m1.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(m1.apply(p, x)), np.asarray(m2.apply(p, x)), atol=1e-5
    )


def test_module_uses_pallas_path(rng):
    """GraphGuidedAttention(use_pallas=True) must agree with the composite."""
    from structured_alignment_vqa_tpu.ops.attention import GraphGuidedAttention

    x = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    graph = jnp.asarray((rng.random((2, 9, 9)) > 0.4).astype(np.float32))
    m1 = GraphGuidedAttention(num_units=16, num_heads=2, use_pallas=True)
    m2 = GraphGuidedAttention(num_units=16, num_heads=2, use_pallas=False)
    p = m1.init(jax.random.key(0), x, x, x, graph)
    o1 = m1.apply(p, x, x, x, graph)
    o2 = m2.apply(p, x, x, x, graph)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


class TestFlashGraphAttention:
    """K-blocked online-softmax kernel vs the composite op."""

    @pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
    def test_matches_composite(self, rng, renorm):
        from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
            flash_graph_attention,
        )

        q, k, v, km, qm, graph = make_inputs(rng, b=2, l=20, c=16)
        got = flash_graph_attention(
            q, k, v, km, qm, graph, 4, renorm, q_tile=8, k_tile=8, interpret=True
        )
        want, _ = attention_core(
            q, k, v, key_mask=km, query_mask=qm, num_heads=4,
            graph=graph, renorm=renorm,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_masked_tile_with_connected_graph(self, rng):
        """A fully key-masked K tile whose graph entries are 1 (the cross-stage
        block over padding) must contribute exactly nothing."""
        from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
            flash_graph_attention,
        )

        b, l, c = 1, 16, 16
        x = rng.standard_normal((b, l, c)).astype(np.float32)
        x[0, 8:] = 0.0  # second K tile entirely padding
        q = jnp.asarray(np.maximum(x, 0) + 0.1)
        km = content_mask(jnp.asarray(x))
        qm = content_mask(jnp.asarray(x))
        graph = jnp.ones((b, l, l), jnp.float32)  # graph connects everything
        got = flash_graph_attention(
            q, q, q, km, qm, graph, 2, "l1", q_tile=8, k_tile=8, interpret=True
        )
        want, _ = attention_core(
            q, q, q, key_mask=km, query_mask=qm, num_heads=2,
            graph=graph, renorm="l1",
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    @pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
    def test_gradients_match_composite(self, rng, renorm):
        """The hand-derived Pallas backward (dQ + dK/dV kernels) vs XLA
        autodiff of the composite — multiple tiles in both directions."""
        from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
            flash_graph_attention,
        )

        q, k, v, km, qm, graph = make_inputs(rng, b=2, l=20, c=16)

        def f(q, k, v):
            return jnp.sum(flash_graph_attention(
                q, k, v, km, qm, graph, 2, renorm, q_tile=8, k_tile=8, interpret=True
            ) ** 2)

        def g_(q, k, v):
            out, _ = attention_core(
                q, k, v, key_mask=km, query_mask=qm, num_heads=2,
                graph=graph, renorm=renorm,
            )
            return jnp.sum(out ** 2)

        ga = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gb = jax.grad(g_, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    @pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
    def test_gradients_dead_rows(self, rng, renorm):
        """Rows with zero graph neighbors hit the eps-denominator branch
        (ind=0): the backward's dead-row correction term must match autodiff
        of the composite exactly."""
        from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
            flash_graph_attention,
        )

        q, k, v, km, qm, graph = make_inputs(rng, b=2, l=16, c=16)
        graph = np.array(graph)
        graph[0, 3, :] = 0.0   # valid row, no neighbors
        graph[1, 0, :] = 0.0
        graph = jnp.asarray(graph)

        def f(q, k, v):
            return jnp.sum(flash_graph_attention(
                q, k, v, km, qm, graph, 2, renorm, q_tile=8, k_tile=8, interpret=True
            ) ** 2)

        def g_(q, k, v):
            out, _ = attention_core(
                q, k, v, key_mask=km, query_mask=qm, num_heads=2,
                graph=graph, renorm=renorm,
            )
            return jnp.sum(out ** 2)

        ga = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gb = jax.grad(g_, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    def test_gradients_masked_tile(self, rng):
        """A fully key-masked K tile with graph=1 everywhere must produce
        zero gradient contributions from that tile."""
        from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
            flash_graph_attention,
        )

        b, l, c = 1, 16, 16
        x = rng.standard_normal((b, l, c)).astype(np.float32)
        x[0, 8:] = 0.0
        q = jnp.asarray(np.maximum(x, 0) + 0.1 * (x[..., :1] * 0 + 1) * (np.arange(l)[None, :, None] < 8))
        km = content_mask(jnp.asarray(x))
        qm = content_mask(jnp.asarray(x))
        graph = jnp.ones((b, l, l), jnp.float32)

        def f(q):
            return jnp.sum(flash_graph_attention(
                q, q, q, km, qm, graph, 2, "l1", q_tile=8, k_tile=8, interpret=True
            ) ** 2)

        def g_(q):
            out, _ = attention_core(
                q, q, q, key_mask=km, query_mask=qm, num_heads=2,
                graph=graph, renorm="l1",
            )
            return jnp.sum(out ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(f)(q)), np.asarray(jax.grad(g_)(q)), atol=1e-5
        )

    def test_chunked_composite_matches(self, rng):
        """The scan-over-K-chunks composite (used as the memory-efficient VJP
        target) matches the monolithic composite, values and grads."""
        from structured_alignment_vqa_tpu.ops.pallas_flash_attention import (
            _composite, _composite_chunked,
        )

        q, k, v, km, qm, graph = make_inputs(rng, b=2, l=20, c=16)
        got = _composite_chunked(q, k, v, km, qm, graph, 4, "l1", k_chunk=8)
        want = _composite(q, k, v, km, qm, graph, 4, "l1")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

        f = lambda *a: jnp.sum(_composite_chunked(*a, 4, "l1", k_chunk=8) ** 2)
        g_ = lambda *a: jnp.sum(_composite(*a, 4, "l1") ** 2)
        ga = jax.grad(f, argnums=(0, 1, 2))(q, k, v, km, qm, graph)
        gb = jax.grad(g_, argnums=(0, 1, 2))(q, k, v, km, qm, graph)
        for a, b_ in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

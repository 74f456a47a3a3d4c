"""Numerics tests for the ops core against independent torch/numpy oracles.

Each oracle is written directly from the reference's documented semantics
(SURVEY.md section 2.1) in plain torch/numpy — the reference's CUDA-bound code
cannot run here and is not imported.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.ops import (
    layer_norm,
    label_smoothing,
    sinusoidal_position_encoding,
    content_mask,
    attention_core,
    masked_logsumexp,
    count_sketch_matrix,
    compact_bilinear_pooling,
)
from structured_alignment_vqa_tpu.ops.mil_nce import (
    mil_nce_obj_objective,
    mil_nce_rel_objective,
    compact_softmax_gather,
    MIL_EPS,
)

ATOL = 1e-5


def torch_attention_oracle(q_in, k_in, v_in, wq, bq, wk, bk, wv, bv,
                           num_heads, graph=None, renorm=None, causal=False):
    """Reference attention semantics, written from the spec in torch.

    Linear+ReLU projections; channel-chunk head split stacked on the batch
    axis; content masks; -2**32+1 fill; softmax; optional graph multiply and
    renorm; query mask; value matmul; head merge. No residual/LN (the core op
    under test stops before those).
    """
    q_t, k_t, v_t = map(torch.from_numpy, (q_in, k_in, v_in))
    Q = torch.relu(q_t @ torch.from_numpy(wq).T + torch.from_numpy(bq))
    K = torch.relu(k_t @ torch.from_numpy(wk).T + torch.from_numpy(bk))
    V = torch.relu(v_t @ torch.from_numpy(wv).T + torch.from_numpy(bv))

    Qh = torch.cat(torch.chunk(Q, num_heads, dim=2), dim=0)
    Kh = torch.cat(torch.chunk(K, num_heads, dim=2), dim=0)
    Vh = torch.cat(torch.chunk(V, num_heads, dim=2), dim=0)

    att = torch.bmm(Qh, Kh.permute(0, 2, 1)) / (Kh.shape[-1] ** 0.5)

    key_masks = torch.sign(torch.abs(k_t.sum(-1))).repeat(num_heads, 1)
    key_masks = key_masks.unsqueeze(1).repeat(1, q_t.shape[1], 1)
    fill = torch.full_like(att, float(-2**32 + 1))
    cond = (key_masks == 0.0).float()
    att = fill * cond + att * (1.0 - cond)

    if causal:
        tril = torch.tril(torch.ones(att.shape[1], att.shape[2]))
        cond = (tril.unsqueeze(0).repeat(att.shape[0], 1, 1) == 0.0).float()
        att = fill * cond + att * (1.0 - cond)

    att = torch.softmax(att, dim=-1)
    if graph is not None:
        att = torch.from_numpy(graph).repeat(num_heads, 1, 1) * att
    if renorm == "l1":
        att = TF.normalize(att, p=1, dim=-1)
    elif renorm == "sum_eps":
        att = att / (att.sum(dim=-1, keepdim=True) + 1e-7)

    query_masks = torch.sign(torch.abs(q_t.sum(-1))).repeat(num_heads, 1)
    att = att * query_masks.unsqueeze(2).repeat(1, 1, k_t.shape[1])

    out = torch.bmm(att, Vh)
    out = torch.cat(torch.chunk(out, num_heads, dim=0), dim=2)
    return out.numpy()


def make_attention_inputs(rng, b=3, tq=7, tk=11, c=32):
    q_in = rng.standard_normal((b, tq, c)).astype(np.float32)
    k_in = rng.standard_normal((b, tk, c)).astype(np.float32)
    # introduce padding rows (all-zero) that the content masks must catch
    q_in[0, -2:] = 0.0
    k_in[1, -3:] = 0.0
    v_in = k_in.copy()
    mats = [rng.standard_normal((c, c)).astype(np.float32) * 0.1 for _ in range(3)]
    biases = [rng.standard_normal((c,)).astype(np.float32) * 0.1 for _ in range(3)]
    return q_in, k_in, v_in, mats, biases


def run_core(q_in, k_in, v_in, mats, biases, num_heads, graph=None, renorm=None, causal=False):
    wq, wk, wv = mats
    bq, bk, bv = biases
    q = jax.nn.relu(jnp.asarray(q_in) @ wq.T + bq)
    k = jax.nn.relu(jnp.asarray(k_in) @ wk.T + bk)
    v = jax.nn.relu(jnp.asarray(v_in) @ wv.T + bv)
    out, att = attention_core(
        q, k, v,
        key_mask=content_mask(jnp.asarray(k_in)),
        query_mask=content_mask(jnp.asarray(q_in)),
        num_heads=num_heads,
        graph=None if graph is None else jnp.asarray(graph),
        renorm=renorm,
        causal=causal,
    )
    return np.asarray(out), np.asarray(att)


class TestLayerNorm:
    def test_matches_torch_eps_on_std(self, rng):
        x = rng.standard_normal((4, 9, 16)).astype(np.float32)
        gamma = rng.standard_normal((16,)).astype(np.float32)
        beta = rng.standard_normal((16,)).astype(np.float32)
        got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
        xt = torch.from_numpy(x)
        mean = xt.mean(-1, keepdim=True)
        std = xt.std(-1, keepdim=True)  # unbiased, like the reference
        want = (torch.from_numpy(gamma) * (xt - mean) / (std + 1e-8) + torch.from_numpy(beta)).numpy()
        np.testing.assert_allclose(got, want, atol=ATOL)


class TestLayerNormGradGuard:
    def test_constant_row_has_finite_zero_grad(self):
        """Regression: exactly-constant rows (var=0) must give 0 gradients,
        not NaN (sqrt' at 0 is inf; padded rows hit this at zero-bias init)."""
        gamma = jnp.ones(8)
        beta = jnp.zeros(8)
        x = jnp.stack([jnp.zeros(8), jnp.full(8, 3.0), jnp.arange(8.0)])

        def f(x):
            return jnp.sum(layer_norm(x, gamma, beta))

        g = np.asarray(jax.grad(f)(x))
        assert np.isfinite(g).all()
        np.testing.assert_allclose(g[0], 0.0)
        np.testing.assert_allclose(g[1], 0.0)
        assert np.abs(g[2]).max() > 0  # normal rows still flow


class TestLabelSmoothing:
    def test_formula(self):
        y = jnp.eye(5)[jnp.array([1, 3])]
        got = np.asarray(label_smoothing(y))
        want = 0.9 * np.eye(5)[[1, 3]] + 0.1 / 5
        np.testing.assert_allclose(got, want, atol=ATOL)


class TestSinusoidalPE:
    def test_shape_and_zero_row(self):
        pe = np.asarray(sinusoidal_position_encoding(2, 6, 8, zeros_pad=True, scale=False))
        assert pe.shape == (2, 6, 8)
        np.testing.assert_allclose(pe[:, 0], 0.0)
        # even columns are sin, odd are cos
        np.testing.assert_allclose(pe[0, 1, 0], np.sin(1.0), atol=ATOL)
        np.testing.assert_allclose(pe[0, 1, 1], np.cos(1.0 / 10000 ** (2.0 / 8)), atol=ATOL)


class TestContentMask:
    def test_zero_rows_masked(self, rng):
        x = rng.standard_normal((2, 5, 8)).astype(np.float32)
        x[0, 2] = 0.0
        m = np.asarray(content_mask(jnp.asarray(x)))
        assert m[0, 2] == 0.0
        assert m[0, 0] == 1.0 and m[1, 4] == 1.0


class TestAttentionCore:
    @pytest.mark.parametrize("num_heads", [1, 4])
    def test_vanilla_matches_torch(self, rng, num_heads):
        q_in, k_in, v_in, mats, biases = make_attention_inputs(rng)
        got, _ = run_core(q_in, k_in, v_in, mats, biases, num_heads)
        want = torch_attention_oracle(
            q_in, k_in, v_in, mats[0], biases[0], mats[1], biases[1], mats[2], biases[2], num_heads
        )
        # oracle output is head-major stacked on batch: fold back
        b = q_in.shape[0]
        np.testing.assert_allclose(got, want[:b], atol=1e-4)

    @pytest.mark.parametrize("renorm", ["l1", "sum_eps"])
    def test_graph_guided_matches_torch(self, rng, renorm):
        q_in, k_in, v_in, mats, biases = make_attention_inputs(rng, tq=11, tk=11)
        graph = (rng.random((3, 11, 11)) > 0.5).astype(np.float32)
        graph[0, 4, :] = 0.0  # fully disconnected row exercises the renorm clamp
        got, att = run_core(q_in, k_in, v_in, mats, biases, 4, graph=graph, renorm=renorm)
        want = torch_attention_oracle(
            q_in, k_in, v_in, mats[0], biases[0], mats[1], biases[1], mats[2], biases[2], 4,
            graph=graph, renorm=renorm,
        )
        np.testing.assert_allclose(got, want[:3], atol=1e-4)
        # rows multiplied by an all-zero adjacency must renormalize to zero
        np.testing.assert_allclose(np.asarray(att)[0, :, 4, :], 0.0, atol=ATOL)

    def test_causal_single_token(self, rng):
        q_in, k_in, v_in, mats, biases = make_attention_inputs(rng, tq=5, tk=5)
        got, _ = run_core(q_in, k_in, v_in, mats, biases, 2, causal=True)
        want = torch_attention_oracle(
            q_in, k_in, v_in, mats[0], biases[0], mats[1], biases[1], mats[2], biases[2], 2,
            causal=True,
        )
        np.testing.assert_allclose(got, want[:3], atol=1e-4)

    def test_head_layout_equivalence(self, rng):
        """Channel-chunk head split == reshape-transpose split."""
        q_in, k_in, v_in, mats, biases = make_attention_inputs(rng, b=2, tq=4, tk=4, c=16)
        for h in (2, 8):
            got, _ = run_core(q_in, k_in, v_in, mats, biases, h)
            want = torch_attention_oracle(
                q_in, k_in, v_in, mats[0], biases[0], mats[1], biases[1], mats[2], biases[2], h
            )
            np.testing.assert_allclose(got, want[:2], atol=1e-4)


class TestMilNce:
    def test_masked_logsumexp(self, rng):
        x = rng.standard_normal(10).astype(np.float32)
        valid = np.array([True] * 6 + [False] * 4)
        got = float(masked_logsumexp(jnp.asarray(x), jnp.asarray(valid)))
        want = float(torch.logsumexp(torch.from_numpy(x[:6]), dim=0))
        assert abs(got - want) < ATOL

    def test_obj_objective_matches_torch(self, rng):
        b, o, topn = 2, 5, 3
        mask = np.zeros((b, o, topn), dtype=np.float32)
        mask[0, :3] = 1.0
        mask[1, :4] = 1.0
        pos = rng.standard_normal((b, o, topn)).astype(np.float32) * mask
        neg = rng.standard_normal((b, o, topn)).astype(np.float32) * mask
        got = float(mil_nce_obj_objective(jnp.asarray(pos), jnp.asarray(neg)))

        pos_t = torch.from_numpy(pos).unsqueeze(-1).clamp(min=MIL_EPS)
        neg_t = torch.from_numpy(neg).unsqueeze(-1).clamp(min=MIL_EPS)
        zeros = torch.zeros_like(neg_t).clamp(min=MIL_EPS)
        num = torch.logsumexp(torch.cat([pos_t, zeros], dim=1), dim=2)
        den = torch.logsumexp(torch.cat([pos_t, neg_t], dim=1), dim=2)
        want = float((num - den).mean())
        assert abs(got - want) < ATOL

    def test_rel_objective_matches_gathered(self, rng):
        scores_p = rng.standard_normal(8).astype(np.float32)
        scores_n = rng.standard_normal(8).astype(np.float32)
        valid_p = np.array([1, 1, 0, 1, 0, 0, 1, 0], bool)
        valid_n = np.array([1, 0, 1, 1, 1, 0, 0, 0], bool)
        got = float(mil_nce_rel_objective(
            jnp.asarray(scores_p), jnp.asarray(valid_p),
            jnp.asarray(scores_n), jnp.asarray(valid_n)))
        p = torch.from_numpy(scores_p[valid_p]).clamp(min=MIL_EPS)
        n = torch.from_numpy(scores_n[valid_n]).clamp(min=MIL_EPS)
        want = float(torch.logsumexp(p, 0) - torch.logsumexp(torch.cat([p, n]), 0))
        assert abs(got - want) < ATOL

    def test_compact_softmax_gather(self, rng):
        scores = rng.standard_normal(6).astype(np.float32)
        valid = np.array([1, 0, 1, 1, 0, 1], bool)
        # compacted valid vector = scores[[0,2,3,5]] clamped, softmaxed
        compact = torch.softmax(torch.from_numpy(scores[valid]).clamp(min=MIL_EPS), dim=0).numpy()
        idx = np.array([0, 3, 1, 2, 0, 1])
        got = np.asarray(compact_softmax_gather(
            jnp.asarray(scores), jnp.asarray(valid), jnp.asarray(idx)))
        want = compact[idx]
        np.testing.assert_allclose(got, want, atol=ATOL)
        # out-of-range compacted index -> 0 weight
        got_oob = np.asarray(compact_softmax_gather(
            jnp.asarray(scores), jnp.asarray(valid), jnp.asarray(np.array([5, -1, 0, 0, 0, 0]))))
        assert got_oob[0] == 0.0 and got_oob[1] == 0.0


class TestMCB:
    def test_matches_torch_fft_path(self, rng):
        d_in, d_out, b = 16, 32, 4
        s1 = count_sketch_matrix(rng, d_in, d_out)
        s2 = count_sketch_matrix(rng, d_in, d_out)
        assert (np.abs(s1).sum(axis=1) == 1).all()  # exactly one +-1 per row
        x1 = rng.standard_normal((b, 1, d_in)).astype(np.float32)
        x2 = rng.standard_normal((b, 1, d_in)).astype(np.float32)
        got = np.asarray(compact_bilinear_pooling(
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(s1), jnp.asarray(s2), d_out))

        f1 = torch.fft.rfft(torch.from_numpy(x1) @ torch.from_numpy(s1), dim=-1)
        f2 = torch.fft.rfft(torch.from_numpy(x2) @ torch.from_numpy(s2), dim=-1)
        cbp = torch.fft.irfft(f1 * f2, n=d_out, dim=-1) * d_out
        ss = torch.sqrt(torch.relu(cbp)) - torch.sqrt(torch.relu(-cbp))
        want = TF.normalize(ss, dim=0, p=2).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_circular_convolution_property(self, rng):
        # count-sketch of outer product: <psi(x1) * psi(x2)> approximates <x1 x2^T>
        d_in, d_out = 8, 64
        s1 = count_sketch_matrix(rng, d_in, d_out)
        s2 = count_sketch_matrix(rng, d_in, d_out)
        x = np.ones((1, 1, d_in), dtype=np.float32)
        out = np.asarray(compact_bilinear_pooling(
            jnp.asarray(x), jnp.asarray(x), jnp.asarray(s1), jnp.asarray(s2), d_out))
        assert out.shape == (1, 1, d_out)
        assert np.isfinite(out).all()

"""Hand-derived backward kernel for the fused graph-guided attention (+LN).

Forward (per batch element, per head; see `pallas_attention.py`):

    S = QK^T / sqrt(dh);  S[,:j] = -2^32+1 where key_mask[j]==0
    P = softmax(S)
    G = P * graph
    l1:      r = max(sum(G), 1e-12);   N = G / r
    sum_eps: r = sum(G) + 1e-7;        N = G / r
    A = N * query_mask[:, None]
    O = A @ V          (concat over heads)
    x = O + residual;  out = LN_ref(x)  (eps on std, unbiased var, var>0 guard)

Backward (recompute-forward / flash style — only q, k, v, masks, graph,
residual and LN params are saved):

    LN: x_hat = (x-mu)/(s+eps),  s = sqrt(var) (0 when var==0)
        dbeta  = sum_rows(dy)                  [per-batch partials, reduced outside]
        dgamma = sum_rows(dy * x_hat)
        dxh = dy * gamma
        dx = (dxh - mean(dxh)) / (s+eps)
             - x_hat * sum(dxh*(x-mu)) / ((s+eps)^2 * (n-1) * s)   [0 when var==0]
    dResidual = dx;  dO = dx
    dV = A^T dO;     dA = dO V^T
    dN = dA * query_mask
    l1:      dG = dN/r - 1[r>eps] * sign(G) * sum(dN*G)/r^2
    sum_eps: dG = dN/r - sign'(=1) ... sum term uses d r/dG_j = 1
    dP = dG * graph
    dS = P * (dP - sum(dP*P))
    dS = 0 on masked key columns
    dQ_h = dS K_h / sqrt(dh);  dK_h = dS^T Q_h / sqrt(dh)

Matches XLA autodiff of the composite to ~1e-5 in f32 (tested in
tests/test_pallas_attention.py), including the zero-variance LN guard, L1
clamp, and sign(0)=0 subgradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from structured_alignment_vqa_tpu.ops.layers import NEG_MASK_VALUE
from structured_alignment_vqa_tpu.ops.attention import L1_NORM_EPS, SUM_NORM_EPS

LANE = 128


def _bwd_kernel(q_ref, k_ref, v_ref, kmask_ref, qmask_ref, graph_ref, res_ref,
                gamma_ref, beta_ref, dy_ref,
                dq_ref, dk_ref, dv_ref, dres_ref, dgamma_ref, dbeta_ref,
                *, num_heads: int, renorm: str, fuse_ln: bool):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    km = kmask_ref[0]          # (1, L)
    qm = qmask_ref[0]          # (1, L)
    graph = graph_ref[0]       # (L, L)
    dy = dy_ref[0].astype(jnp.float32)  # (L, C)

    c = q.shape[-1]
    dh = c // num_heads
    scale = 1.0 / (dh ** 0.5)
    key_fill = km == 0.0
    qcol = qm.reshape(-1, 1)

    # ---- recompute forward attention per head, keep A for the V-matmul ----
    def head_attention(h):
        sl = slice(h * dh, (h + 1) * dh)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.where(key_fill, NEG_MASK_VALUE, scores)
        p = jax.nn.softmax(scores, axis=-1)
        g = p * graph
        if renorm == "l1":
            rsum = jnp.sum(g, axis=-1, keepdims=True)  # g >= 0: |g| == g
            r = jnp.maximum(rsum, L1_NORM_EPS)
            live = (rsum > L1_NORM_EPS).astype(jnp.float32)
        else:
            rsum = jnp.sum(g, axis=-1, keepdims=True)
            r = rsum + SUM_NORM_EPS
            live = jnp.ones_like(rsum)
        n = g / r
        a = n * qcol
        return p, g, r, live, n, a

    if fuse_ln:
        # recompute O (all heads) for the LN backward
        outs = []
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            _, _, _, _, _, a = head_attention(h)
            outs.append(jax.lax.dot_general(
                a.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        acc = jnp.concatenate(outs, axis=-1)
        x = acc + res_ref[0].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(x - mu), axis=-1, keepdims=True) / max(c - 1, 1)
        nonzero = var > 0.0
        s = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, var, 1.0)), 0.0)
        inv = 1.0 / (s + 1e-8)
        x_hat = (x - mu) * inv

        gamma = gamma_ref[0]
        dbeta_ref[0] = jnp.sum(dy, axis=0, keepdims=True)
        dgamma_ref[0] = jnp.sum(dy * x_hat, axis=0, keepdims=True)
        dxh = dy * gamma
        term1 = (dxh - jnp.mean(dxh, axis=-1, keepdims=True)) * inv
        # d-std path: d s/d x_j = (x_j-mu)/((n-1)s) (the mean term vanishes
        # since sum(x-mu)=0); zero on constant rows via the double-where guard
        ssum = jnp.sum(dxh * (x - mu), axis=-1, keepdims=True)
        dx = term1 - jnp.where(
            nonzero,
            (x - mu) * (ssum * inv * inv) / (max(c - 1, 1) * jnp.where(nonzero, s, 1.0)),
            0.0,
        )
        dres_ref[0] = dx.astype(dres_ref.dtype)
        do = dx
    else:
        dres_ref[0] = jnp.zeros_like(res_ref[0])
        dgamma_ref[0] = jnp.zeros_like(gamma_ref[0])
        dbeta_ref[0] = jnp.zeros_like(beta_ref[0])
        do = dy

    # ---- per-head attention backward ----
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        p, g, r, live, n, a = head_attention(h)
        do_h = do[:, sl]
        dv_h = jax.lax.dot_general(  # A^T dO
            a, do_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        da = jax.lax.dot_general(    # dO V^T
            do_h, v[:, sl].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dn = da * qcol
        inner = jnp.sum(dn * g, axis=-1, keepdims=True)
        sign_g = jnp.sign(g)  # 0 at exactly-zero entries, matching jnp.abs grad
        if renorm == "l1":
            dg = dn / r - live * sign_g * inner / (r * r)
        else:
            dg = dn / r - inner / (r * r)
        dp = dg * graph
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = jnp.where(key_fill, 0.0, ds) * scale
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, k[:, sl].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, q[:, sl].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_h.astype(dv_ref.dtype)


def fused_attention_bwd(q, k, v, key_mask, query_mask, graph, residual, gamma, beta,
                        dy, num_heads: int, renorm: str, fuse_ln: bool = True,
                        interpret: bool = False):
    """Returns (dq, dk, dv, dresidual, dgamma, dbeta)."""
    b, l, c = q.shape
    lp = ((l + LANE - 1) // LANE) * LANE

    def pad(x, axis=1):
        if x.shape[axis] == lp:
            return x
        w = [(0, 0)] * x.ndim
        w[axis] = (0, lp - x.shape[axis])
        return jnp.pad(x, w)

    qp, kp, vp = pad(q), pad(k), pad(v)
    km = pad(key_mask.astype(jnp.float32).reshape(b, 1, l), 2)
    qm = pad(query_mask.astype(jnp.float32).reshape(b, 1, l), 2)
    g = pad(pad(graph.astype(jnp.float32), 1), 2)
    res = pad(residual) if fuse_ln else jnp.zeros_like(qp)
    dyp = pad(dy)
    gam = gamma.reshape(1, c)
    bet = beta.reshape(1, c)

    kernel = functools.partial(
        _bwd_kernel, num_heads=num_heads, renorm=renorm, fuse_ln=fuse_ln
    )
    vec = lambda: pl.BlockSpec((1, lp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cvec = lambda: pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[vec(), vec(), vec(), row(), row(),
                  pl.BlockSpec((1, lp, lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  vec(), cvec(), cvec(), vec()],
        out_specs=(vec(), vec(), vec(), vec(),
                   pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((b, lp, c), q.dtype),
            jax.ShapeDtypeStruct((b, lp, c), k.dtype),
            jax.ShapeDtypeStruct((b, lp, c), v.dtype),
            jax.ShapeDtypeStruct((b, lp, c), q.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * lp * lp * c,
            bytes_accessed=(8 * b * lp * c + b * lp * lp) * 4,
            transcendentals=2 * b * num_heads * lp * lp,
        ),
        interpret=interpret,
    )(qp, kp, vp, km, qm, g, res, gam, bet, dyp)

    dq, dk, dv, dres, dgam, dbet = outs
    dq, dk, dv, dres = (x[:, :l] for x in (dq, dk, dv, dres))
    dgamma = jnp.sum(dgam[:, 0], axis=0)
    dbeta = jnp.sum(dbet[:, 0], axis=0)
    if not fuse_ln:
        return dq, dk, dv, None, None, None
    return dq, dk, dv, dres, dgamma, dbeta

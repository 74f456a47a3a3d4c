"""Ground-truth parity: run the ACTUAL reference PyTorch model (CPU, with
.cuda() no-op'd) against this framework with identical weights.

Only runs where the reference checkout is mounted (this dev environment);
skipped elsewhere. This is the strongest evidence the numerics contract in
docs/PARITY.md holds: same weights + same batch -> same logits, through the
real reference code, not an oracle re-implementation.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/models"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

import torch


@pytest.fixture(scope="module", autouse=True)
def cpu_reference():
    """Import the reference with CUDA calls neutralized."""
    if not os.path.isdir(REF):
        yield None
        return
    orig_cuda = torch.Tensor.cuda
    orig_mod_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        yield
    finally:
        torch.Tensor.cuda = orig_cuda
        torch.nn.Module.cuda = orig_mod_cuda
        sys.path.remove(REF)


def to_torch(x):
    return torch.from_numpy(np.asarray(x).copy())


class TestOpsParity:
    """Op-level: the reference `modules.py` classes vs ours, same weights."""

    def _copy_attention_weights(self, ref_att, params):
        p = params["params"]
        with torch.no_grad():
            for tname, fname in (("Q_proj", "q_proj"), ("K_proj", "k_proj"), ("V_proj", "v_proj")):
                getattr(ref_att, tname)[0].weight.copy_(to_torch(p[fname]["kernel"]).T)
                getattr(ref_att, tname)[0].bias.copy_(to_torch(p[fname]["bias"]))
            ref_att.normalization.gamma.copy_(to_torch(p["ln"]["gamma"]))
            ref_att.normalization.beta.copy_(to_torch(p["ln"]["beta"]))

    def test_graph_guided_attention(self, rng):
        import modules as ref_modules
        import jax
        import jax.numpy as jnp
        from structured_alignment_vqa_tpu.ops.attention import GraphGuidedAttention

        b, t, c, h = 3, 7, 16, 4
        x = rng.standard_normal((b, t, c)).astype(np.float32)
        x[0, -2:] = 0.0
        graph = (rng.random((b, t, t)) > 0.4).astype(np.float32)

        mine = GraphGuidedAttention(num_units=c, num_heads=h)
        params = mine.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), jnp.asarray(graph))
        # move params off the LayerNorm knife edge (see docs/PARITY.md)
        params = jax.tree.map(
            lambda l: l + 0.05 * jax.random.normal(jax.random.key(1), l.shape, l.dtype), params
        )

        ref = ref_modules.new_multihead_attention(num_units=c, num_heads=h, dropout_rate=0)
        ref.eval()
        self._copy_attention_weights(ref, params)
        with torch.no_grad():
            want = ref(to_torch(x), to_torch(x), to_torch(x), to_torch(graph)).numpy()

        got = np.asarray(mine.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), jnp.asarray(graph)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_graph_mask_attention(self, rng):
        import modules as ref_modules
        import jax
        import jax.numpy as jnp
        from structured_alignment_vqa_tpu.ops.attention import GraphMaskAttention

        b, t, c, h = 2, 6, 16, 2
        x = rng.standard_normal((b, t, c)).astype(np.float32)
        graph = (rng.random((b, t, t)) > 0.3).astype(np.float32)
        mask_1d = np.ones((b, t), np.float32)

        mine = GraphMaskAttention(num_units=c, num_heads=h)
        params = mine.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), jnp.asarray(graph))
        params = jax.tree.map(
            lambda l: l + 0.05 * jax.random.normal(jax.random.key(1), l.shape, l.dtype), params
        )
        ref = ref_modules.new_multihead_attention_with_graph_mask(num_units=c, num_heads=h, dropout_rate=0)
        ref.eval()
        self._copy_attention_weights(ref, params)
        with torch.no_grad():
            want = ref(to_torch(x), to_torch(x), to_torch(x), to_torch(mask_1d), to_torch(graph)).numpy()
        got = np.asarray(mine.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), jnp.asarray(graph)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_feedforward(self, rng):
        import modules as ref_modules
        import jax
        import jax.numpy as jnp
        from structured_alignment_vqa_tpu.ops.layers import FeedForward

        c = 16
        x = rng.standard_normal((2, 5, c)).astype(np.float32)
        mine = FeedForward(c, (4 * c, c))
        params = mine.init(jax.random.key(0), jnp.asarray(x))
        params = jax.tree.map(
            lambda l: l + 0.05 * jax.random.normal(jax.random.key(1), l.shape, l.dtype), params
        )
        ref = ref_modules.feedforward(c, [4 * c, c])
        ref.eval()
        p = params["params"]
        with torch.no_grad():
            ref.conv1[0].weight.copy_(to_torch(p["fc1"]["kernel"]).T)
            ref.conv1[0].bias.copy_(to_torch(p["fc1"]["bias"]))
            ref.conv2.weight.copy_(to_torch(p["fc2"]["kernel"]).T)
            ref.conv2.bias.copy_(to_torch(p["fc2"]["bias"]))
            ref.normalization.gamma.copy_(to_torch(p["ln"]["gamma"]))
            ref.normalization.beta.copy_(to_torch(p["ln"]["beta"]))
            want = ref(to_torch(x)).numpy()
        got = np.asarray(mine.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-4)


def _batch_to_torch_args(batch, decMask=True, mcb=False):
    """Marshal a VQABatch into the reference forward's 16 positional tensors
    (the `.cuda()` block at `main_itp_ddp_tar_super_node.py:271-316`)."""
    return dict(
        args=(
            to_torch(batch.vis_fea), to_torch(batch.vis_mask).float(),
            to_torch(batch.q_ipt).long(), to_torch(batch.q_mask).float(),
            to_torch(batch.q_graph).float(),
            to_torch(batch.macro_ipt).long(), to_torch(batch.macro_mask).float(),
            to_torch(batch.macro_graph).float(), to_torch(batch.macro_obj_loc).long(),
            to_torch(batch.micro_pos_obj).long(), to_torch(batch.micro_neg_obj).long(),
            to_torch(batch.micro_obj_mask).float(),
            to_torch(batch.micro_pos_rel).long(), to_torch(batch.micro_neg_rel).long(),
            to_torch(batch.micro_pos_rel_loc).long(), to_torch(batch.micro_neg_rel_loc).long(),
        ),
        kwargs=dict(decMask=decMask, mcb=mcb),
    )


class TestTrainingTrajectoryParity:
    """N optimizer steps head-to-head: the reference loss+Adam path
    (`main_itp_ddp_tar_super_node.py:318-366`, run inline on CPU) vs
    ``make_train_step``, same grafted weights, same batches. Catches any
    divergence in gradients, optimizer wiring, or loss composition that a
    single-forward logit check cannot (VERDICT r1 #2)."""

    @pytest.mark.parametrize("only_obj", [True, False])
    def test_training_trajectory(self, rng, only_obj):
        import jax
        import jax.numpy as jnp
        import torch.nn.functional as F
        import AttModel_x3 as ref_mod
        import modules as ref_modules

        from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
        from structured_alignment_vqa_tpu.models import AttModelX3
        from structured_alignment_vqa_tpu.models.config import ModelConfig
        from structured_alignment_vqa_tpu.models.torch_import import import_torch_state_dict
        from structured_alignment_vqa_tpu.parallel.train_step import (
            TrainState,
            adam,
            make_train_step,
        )

        hidden, hidden_mil, classes, blocks, heads = 32, 16, 11, 6, 4
        maxlen, maxlen_q, maxlen_v = 64, 8, 6
        num_rel, lr, n_steps = 7, 1e-3, 20

        glove = types.SimpleNamespace(vectors=torch.randn(50, 300))
        torch.manual_seed(0)
        with torch.no_grad():
            # dropout_rate=0 so both train-mode forwards are deterministic;
            # everything else is the production loss path.
            ref = ref_mod.AttModel(
                glove, hidden, hidden_mil, classes, maxlen_q, maxlen, maxlen_v,
                blocks, heads, 0.0, 0.1, num_rel, only_obj,
            )
            g = torch.Generator().manual_seed(42)
            for p in ref.parameters():
                p.add_(0.05 * torch.randn(p.shape, generator=g))
        ref.train()

        cfg = ModelConfig(
            num_classes=classes, num_relations=num_rel, vocab_size=407000,
            glove_dim=300, hidden_size=hidden, hidden_size_mil=hidden_mil,
            num_blocks=blocks, num_heads=heads, dropout_rate=0.0,
            maxlen=maxlen, maxlen_q=maxlen_q, maxlen_v=maxlen_v, topn=2,
            only_obj=only_obj,
        )
        batches = [
            synthetic_batch(cfg, batch=3, lv=4, lq=5, ls=10, n_rel=4, seed=100 + i)
            for i in range(n_steps // 2)
        ]
        batches = batches * 2  # two passes = 20 steps

        model = AttModelX3(cfg)
        variables = jax.eval_shape(model.init, jax.random.key(0), batches[0])
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
        variables, unmatched = import_torch_state_dict(
            ref.state_dict(), variables, blocks, only_obj=only_obj
        )
        assert unmatched == [], unmatched[:8]

        tx = adam(lr)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            constants=dict(variables.get("constants", {})),
        )
        step = make_train_step(model, tx, cfg, with_milnce=True)

        # Reference loop, inline (`main:318-366`): ensemble log-softmax mean,
        # smoothed one-hot CE, += -mil terms, Adam(lr) step.
        opt = torch.optim.Adam(ref.parameters(), lr)
        lbl_sm = ref_modules.label_smoothing()
        want_ce, want_mil = [], []
        for batch in batches:
            m = _batch_to_torch_args(batch)
            lc, lv, ls_, mil_obj, mil_rel = ref(*m["args"], **m["kwargs"])
            mil = -mil_obj if only_obj else -mil_obj - mil_rel
            opt.zero_grad()
            log_sm = (
                F.log_softmax(lv, -1) + F.log_softmax(ls_, -1) + F.log_softmax(lc, -1)
            ) / 3
            one_hot = torch.zeros((lc.size(0), lc.size(1)))
            one_hot.scatter_(1, to_torch(batch.answer).long().view(-1, 1), 1)
            one_hot = lbl_sm(one_hot)
            ce = (-(one_hot * log_sm).sum(-1)).mean()
            loss = ce + mil
            loss.backward()
            opt.step()
            want_ce.append(float(ce))
            want_mil.append(float(mil))

        got_ce, got_mil = [], []
        for batch in batches:
            state, metrics = step(state, batch, jax.random.key(0))
            got_ce.append(float(metrics["ce"]))
            got_mil.append(float(metrics["mil_nce_loss"]))

        # The trajectory must actually move (otherwise this only re-tests the
        # initial forward) ...
        assert abs(want_ce[-1] - want_ce[0]) > 1e-3
        # ... and every per-step loss must track the reference through grads,
        # Adam moments, and the loss composition.
        np.testing.assert_allclose(got_ce, want_ce, atol=5e-3, rtol=2e-3)
        np.testing.assert_allclose(got_mil, want_mil, atol=5e-3, rtol=2e-3)


class TestFullModelParity:
    """End-to-end: reference AttModel_x3 vs AttModelX3, weights transferred via
    the checkpoint importer, logits compared on the same batch."""

    @pytest.mark.parametrize("only_obj", [True, False])
    def test_logit_parity(self, rng, only_obj):
        import jax
        import jax.numpy as jnp
        import AttModel_x3 as ref_mod

        from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
        from structured_alignment_vqa_tpu.models import AttModelX3
        from structured_alignment_vqa_tpu.models.config import ModelConfig
        from structured_alignment_vqa_tpu.models.torch_import import import_torch_state_dict

        hidden, hidden_mil, classes, blocks, heads = 32, 16, 11, 6, 4
        maxlen, maxlen_q, maxlen_v = 64, 8, 6
        num_rel = 7

        glove = types.SimpleNamespace(vectors=torch.randn(50, 300))
        torch.manual_seed(0)
        with torch.no_grad():  # reference's in-place Parameter writes
            ref = ref_mod.AttModel(
                glove, hidden, hidden_mil, classes, maxlen_q, maxlen, maxlen_v,
                blocks, heads, 0.5, 0.1, num_rel, only_obj,
            )
            # move every parameter off the exact-init knife edge (LN gamma=1,
            # beta=0 makes content masks chaotic — docs/PARITY.md); trained
            # checkpoints are never on it
            g = torch.Generator().manual_seed(42)
            for p in ref.parameters():
                p.add_(0.05 * torch.randn(p.shape, generator=g))
        ref.eval()

        cfg = ModelConfig(
            num_classes=classes, num_relations=num_rel, vocab_size=407000,
            glove_dim=300, hidden_size=hidden, hidden_size_mil=hidden_mil,
            num_blocks=blocks, num_heads=heads, dropout_rate=0.5,
            maxlen=maxlen, maxlen_q=maxlen_q, maxlen_v=maxlen_v, topn=2,
            only_obj=only_obj,
        )
        batch = synthetic_batch(cfg, batch=2, lv=4, lq=5, ls=10, seed=11)
        model = AttModelX3(cfg)
        variables = jax.eval_shape(model.init, jax.random.key(0), batch)
        variables = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables
        )
        variables, unmatched = import_torch_state_dict(
            ref.state_dict(), variables, blocks, only_obj=only_obj
        )
        assert unmatched == [], unmatched[:8]

        with torch.no_grad():
            r = ref(
                to_torch(batch.vis_fea), to_torch(batch.vis_mask).float(),
                to_torch(batch.q_ipt).long(), to_torch(batch.q_mask).float(),
                to_torch(batch.q_graph).float(),
                to_torch(batch.macro_ipt).long(), to_torch(batch.macro_mask).float(),
                to_torch(batch.macro_graph).float(), to_torch(batch.macro_obj_loc).long(),
                to_torch(batch.micro_pos_obj).long(), to_torch(batch.micro_neg_obj).long(),
                to_torch(batch.micro_obj_mask).float(),
                to_torch(batch.micro_pos_rel).long(), to_torch(batch.micro_neg_rel).long(),
                to_torch(batch.micro_pos_rel_loc).long(), to_torch(batch.micro_neg_rel_loc).long(),
                decMask=True, mcb=False,
            )
        want_concat, want_vis, want_syb, want_mil_obj, want_mil_rel = [
            x.numpy() if torch.is_tensor(x) else x for x in r
        ]

        got = model.apply(variables, batch, deterministic=True)
        got_concat, got_vis, got_syb, got_mil_obj, got_mil_rel = [np.asarray(x) for x in got]

        np.testing.assert_allclose(got_mil_obj, want_mil_obj, atol=1e-4)
        if not only_obj:
            np.testing.assert_allclose(got_mil_rel, float(want_mil_rel), atol=1e-4)
        np.testing.assert_allclose(got_vis, want_vis, atol=5e-3)
        np.testing.assert_allclose(got_syb, want_syb, atol=5e-3)
        np.testing.assert_allclose(got_concat, want_concat, atol=5e-3)

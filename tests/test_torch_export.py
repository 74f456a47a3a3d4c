"""JAX -> ``.pth`` checkpoint export: the reference eval driver's loading
path (`models/eval_itp_grid_ddp_tar_gt.py:108-116` — strip ``module.``,
strict ``load_state_dict``) must consume a checkpoint trained here, and the
round trip through `torch_import` must be exact.

Live-reference tests only run where the reference checkout is mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

import torch

REF = "/root/reference/models"


@pytest.fixture(scope="module", autouse=True)
def cpu_reference():
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


def _our_model(only_obj=True, share_glove=False, seed=3):
    import jax
    import jax.numpy as jnp

    from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
    from structured_alignment_vqa_tpu.models import AttModelX3
    from structured_alignment_vqa_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        num_classes=11, num_relations=7, vocab_size=407000, glove_dim=300,
        hidden_size=32, hidden_size_mil=16, num_blocks=6, num_heads=4,
        dropout_rate=0.0, maxlen=64, maxlen_q=8, maxlen_v=6, topn=2,
        only_obj=only_obj, share_glove=share_glove,
    )
    batch = synthetic_batch(cfg, batch=2, lv=4, lq=5, ls=10, seed=11)
    model = AttModelX3(cfg)
    variables = model.init(jax.random.key(seed), batch)
    # trained checkpoints are never on the exact-init knife edge
    # (docs/PARITY.md); neither should the exported tree
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.key(seed + 1), len(leaves))
    variables = jax.tree.unflatten(treedef, [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ])
    return cfg, model, variables, batch


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("only_obj", [True, False])
def test_reference_strict_load_and_logit_parity(only_obj):
    """Train here, eval there: the actual reference model strict-loads the
    exported dict through the eval driver's exact key handling, and its
    logits match ours."""
    import AttModel_x3 as ref_mod

    from structured_alignment_vqa_tpu.models.torch_export import export_state_dict

    cfg, model, variables, batch = _our_model(only_obj=only_obj)

    glove = types.SimpleNamespace(vectors=torch.randn(50, 300))
    torch.manual_seed(0)
    with torch.no_grad():  # reference's in-place Parameter writes
        ref = ref_mod.AttModel(
            glove, cfg.hidden_size, cfg.hidden_size_mil, cfg.num_classes,
            cfg.maxlen_q, cfg.maxlen, cfg.maxlen_v, cfg.num_blocks,
            cfg.num_heads, 0.0, 0.1, cfg.num_relations, only_obj,
        )

    exported = export_state_dict(
        variables, cfg.num_blocks, only_obj=only_obj,
        template=ref.state_dict(),
    )
    assert all(k.startswith("module.") for k in exported)

    # the eval driver's loading block, verbatim semantics
    dict_weights = {}
    for key in exported:
        nkey = key[7:] if key.startswith("module") else key
        dict_weights[nkey] = exported[key]
    ref.load_state_dict(dict_weights)  # strict: every key, every shape
    ref.eval()

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
    want = [x.numpy() if torch.is_tensor(x) else np.asarray(x) for x in r]

    got = model.apply(variables, batch, deterministic=True)
    got = [np.asarray(x) for x in got]
    for w, g, name in zip(want[:3], got[:3], ("concat", "vis", "syb")):
        np.testing.assert_allclose(g, w, atol=2e-4, rtol=2e-4, err_msg=name)
    np.testing.assert_allclose(got[3], want[3], atol=2e-4, rtol=2e-4)
    if not only_obj:
        np.testing.assert_allclose(got[4], want[4], atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("only_obj", [True, False])
def test_round_trip_exact(only_obj):
    """import(export(vars)) reproduces every mapped leaf bit-exactly."""
    import jax

    from structured_alignment_vqa_tpu.models.torch_export import export_state_dict
    from structured_alignment_vqa_tpu.models.torch_import import import_torch_state_dict

    cfg, model, variables, batch = _our_model(only_obj=only_obj)
    exported = export_state_dict(variables, cfg.num_blocks, only_obj=only_obj)

    reimported, unmatched = import_torch_state_dict(
        exported, jax.tree.map(lambda x: x, variables), cfg.num_blocks,
        only_obj=only_obj,
    )
    assert unmatched == [], unmatched[:8]
    flat_a = jax.tree.leaves_with_path(variables)
    flat_b = dict(jax.tree.leaves_with_path(reimported))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf, np.float32), np.asarray(flat_b[path], np.float32),
            err_msg=str(path),
        )


def test_share_glove_fans_out():
    """One shared table here -> the reference's three syb_emb copies."""
    from structured_alignment_vqa_tpu.models.torch_export import export_state_dict

    cfg, model, variables, batch = _our_model(share_glove=True)
    exported = export_state_dict(variables, cfg.num_blocks)
    table = np.asarray(variables["params"]["glove"]["table"], np.float32)
    for slot in ("att_vis_grid.syb_emb.weight", "att_syb.syb_emb.weight",
                 "MIL_NCE.syb_emb.weight"):
        np.testing.assert_array_equal(
            exported["module." + slot].numpy(), table, err_msg=slot
        )


def test_save_pth_round_trips(tmp_path):
    from structured_alignment_vqa_tpu.models.torch_export import save_pth

    cfg, model, variables, batch = _our_model()
    fn = str(tmp_path / "model_0.pth")
    save_pth(fn, variables, cfg.num_blocks)
    sd = torch.load(fn)
    assert any(k.startswith("module.") for k in sd)
    w = sd["module.att_vis_grid.syb_mlp2.weight"]
    np.testing.assert_array_equal(
        w.numpy(),
        np.asarray(
            variables["params"]["att_vis_grid"]["body"]["syb_mlp2"]["kernel"],
            np.float32,
        ).T,
    )

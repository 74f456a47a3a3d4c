"""Reference-checkpoint import tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
from structured_alignment_vqa_tpu.models import AttModelX3
from structured_alignment_vqa_tpu.models.config import tiny_test_config
from structured_alignment_vqa_tpu.models.torch_import import (
    import_torch_state_dict,
    name_map,
)


def fake_state_dict(variables, num_blocks, only_obj, use_mcb, rng, prefix=""):
    """Build a reference-shaped state_dict from the flax tree via the map."""
    params = variables["params"]
    sd = {}
    for tname, path, transpose in name_map(num_blocks, only_obj, use_mcb):
        node = params
        ok = True
        for k in path:
            if k not in node:
                ok = False
                break
            node = node[k]
        if not ok:
            continue
        shape = np.asarray(node).shape
        if transpose:
            shape = shape[::-1]
        sd[prefix + tname] = rng.standard_normal(shape).astype(np.float32)
    # dead reference params that must be ignored without complaint
    sd[prefix + "att_vis_grid.v_mlp.0.weight"] = rng.standard_normal((4, 4)).astype(np.float32)
    sd[prefix + "MIL_NCE.bilinear.weight"] = rng.standard_normal((3, 2, 2)).astype(np.float32)
    return sd


@pytest.mark.parametrize("only_obj", [True, False])
def test_import_maps_everything(only_obj, rng):
    cfg = tiny_test_config(only_obj=only_obj)
    batch = synthetic_batch(cfg, batch=2, lv=3, lq=4, ls=8)
    model = AttModelX3(cfg)
    variables = model.init(jax.random.key(0), batch)

    sd = fake_state_dict(variables, cfg.num_blocks, only_obj, False, rng, prefix="module.")
    new_vars, unmatched = import_torch_state_dict(
        sd, variables, cfg.num_blocks, only_obj=only_obj
    )
    assert unmatched == [], unmatched

    # spot check: linear weights transposed, embeddings copied directly
    w = sd["module.att_vis_grid.syb_mlp2.weight"]
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["att_vis_grid"]["body"]["syb_mlp2"]["kernel"]), w.T
    )
    t = sd["module.MIL_NCE.syb_emb.weight"]
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["mil_nce"]["syb_emb"]["table"]), t
    )
    g = sd["module.att_syb.enc_self_attention_1.normalization.gamma"]
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["att_syb"]["body"]["block_1"]["enc_self_attention_1"]["ln"]["gamma"]), g
    )
    if not only_obj:
        np.testing.assert_array_equal(
            np.asarray(new_vars["params"]["mil_nce"]["R"]), sd["module.MIL_NCE.R"]
        )

    # the imported model must still run
    out = model.apply(new_vars, batch)
    assert np.isfinite(np.asarray(out[0])).all()


def test_import_shape_mismatch_raises(rng):
    cfg = tiny_test_config()
    batch = synthetic_batch(cfg, batch=2, lv=3, lq=4, ls=8)
    model = AttModelX3(cfg)
    variables = model.init(jax.random.key(0), batch)
    sd = {"att_vis_grid.syb_mlp2.weight": rng.standard_normal((7, 9)).astype(np.float32)}
    with pytest.raises(ValueError, match="shape mismatch"):
        import_torch_state_dict(sd, variables, cfg.num_blocks)

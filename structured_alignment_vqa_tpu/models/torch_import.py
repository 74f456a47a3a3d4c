"""Reference-checkpoint import: torch ``model_{epoch}.pth`` -> AttModelX3 params.

The reference saves ``model.state_dict()`` each epoch
(`main_itp_ddp_tar_super_node.py:427-428`), optionally with DDP's ``module.``
prefix (stripped, as `eval_itp_grid_ddp_tar_gt.py:107-116` does). This module
maps those tensors onto the flax param tree so a model trained with the
PyTorch reference can be served/fine-tuned here.

Key layout differences handled:

* torch ``nn.Linear.weight`` is (out, in); flax ``Dense.kernel`` is (in, out)
  -> transposed;
* the reference's attention projections are ``X_proj.0.weight`` (Sequential
  Linear+ReLU); its LayerNorm is ``normalization.gamma/beta``;
* reference parameters that its forward never reads (``v_mlp``,
  ``input_proj``, ``q_mlp``, ``v_positional_encoding``, ``MIL_NCE.bilinear``
  — `AttModel_x3.py:46-67,332`) are skipped;
* MCB sketch matrices land in the ``constants`` collection.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _strip_ddp(sd: Dict) -> Dict:
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def _branch_entries(src: str, dst_body: list, num_blocks: int):
    """Name map for one encoder/decoder branch (AttModel_vis_grid / AttModel_syb)."""
    out = []

    def add(tname, path, transpose=False):
        out.append((f"{src}.{tname}", tuple(dst_body + path), transpose))

    add("syb_emb.weight", ["syb_emb", "table"])
    add("syb_mlp.0.weight", ["body", "syb_mlp", "kernel"], True)
    add("syb_mlp.0.bias", ["body", "syb_mlp", "bias"])
    add("syb_mlp2.weight", ["body", "syb_mlp2", "kernel"], True)
    add("syb_mlp2.bias", ["body", "syb_mlp2", "bias"])
    add("syb_positional_encoding.0.lookup_table", ["body", "syb_positional_encoding", "lookup_table"])
    add("syb_positional_encoding.lookup_table", ["body", "syb_positional_encoding", "lookup_table"])
    add("dec_emb.lookup_table", ["body", "dec_emb", "lookup_table"])
    add("dec_positional_encoding.lookup_table", ["body", "dec_positional_encoding", "lookup_table"])

    for i in range(num_blocks):
        for ref_mod, here_mod, parent in (
            (f"enc_self_attention_{i}", f"enc_self_attention_{i}", ["body", f"block_{i}"]),
            (f"dec_self_attention_{i}", f"dec_self_attention_{i}", ["body"]),
            (f"dec_vanilla_attention_{i}", f"dec_vanilla_attention_{i}", ["body"]),
        ):
            for p, q_ in (("Q_proj", "q_proj"), ("K_proj", "k_proj"), ("V_proj", "v_proj")):
                add(f"{ref_mod}.{p}.0.weight", parent + [here_mod, q_, "kernel"], True)
                add(f"{ref_mod}.{p}.0.bias", parent + [here_mod, q_, "bias"])
            add(f"{ref_mod}.normalization.gamma", parent + [here_mod, "ln", "gamma"])
            add(f"{ref_mod}.normalization.beta", parent + [here_mod, "ln", "beta"])
        for ref_mod, parent in (
            (f"enc_feed_forward_{i}", ["body", f"block_{i}"]),
            (f"dec_feed_forward_{i}", ["body"]),
        ):
            here = ref_mod
            add(f"{ref_mod}.conv1.0.weight", parent + [here, "fc1", "kernel"], True)
            add(f"{ref_mod}.conv1.0.bias", parent + [here, "fc1", "bias"])
            add(f"{ref_mod}.conv2.weight", parent + [here, "fc2", "kernel"], True)
            add(f"{ref_mod}.conv2.bias", parent + [here, "fc2", "bias"])
            add(f"{ref_mod}.normalization.gamma", parent + [here, "ln", "gamma"])
            add(f"{ref_mod}.normalization.beta", parent + [here, "ln", "beta"])
    return out


def name_map(num_blocks: int, only_obj: bool, use_mcb: bool):
    """(torch name, flax path, transpose) triplets for AttModelX3."""
    entries = []
    entries += _branch_entries("att_vis_grid", ["att_vis_grid"], num_blocks)
    entries += _branch_entries("att_syb", ["att_syb"], num_blocks)

    def add(tname, path, transpose=False):
        entries.append((tname, tuple(path), transpose))

    add("MIL_NCE.syb_emb.weight", ["mil_nce", "syb_emb", "table"])
    for mod in ("marco_mlp", "syb_mlp", "vis_mlp", "ipt_mlp"):
        add(f"MIL_NCE.{mod}.0.weight", ["mil_nce", mod, "kernel"], True)
        add(f"MIL_NCE.{mod}.0.bias", ["mil_nce", mod, "bias"])
    if not only_obj:
        add("MIL_NCE.R", ["mil_nce", "R"])

    for ref_head, here in (("cls", "cls"), ("cls_vis", "cls_vis"), ("cls_syb", "cls_syb")):
        add(f"{ref_head}.0.weight", [f"{here}_hidden", "kernel"], True)
        add(f"{ref_head}.0.bias", [f"{here}_hidden", "bias"])
        add(f"{ref_head}.3.weight", [f"{here}_out", "kernel"], True)
        add(f"{ref_head}.3.bias", [f"{here}_out", "bias"])
    if use_mcb:
        add("cls_mcb.0.weight", ["cls_mcb_hidden", "kernel"], True)
        add("cls_mcb.0.bias", ["cls_mcb_hidden", "bias"])
        add("cls_mcb.3.weight", ["cls_mcb_out", "kernel"], True)
        add("cls_mcb.3.bias", ["cls_mcb_out", "bias"])
    return entries


def _set_path(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> bool:
    node = tree
    for k in path[:-1]:
        if k not in node:
            return False
        node = node[k]
    if path[-1] not in node:
        return False
    if tuple(node[path[-1]].shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{node[path[-1]].shape} vs {value.shape}")
    node[path[-1]] = value
    return True


def import_torch_state_dict(state_dict: Dict, variables: Dict, num_blocks: int,
                            only_obj: bool = True, use_mcb: bool = False):
    """Return new variables with every mappable reference tensor grafted in.

    ``variables``: the flax variables dict from ``model.init`` (params [+
    constants]). Unmatched reference tensors are returned for inspection.
    """
    import jax

    sd = _strip_ddp(state_dict)
    params = jax.tree.map(lambda x: np.asarray(x), variables["params"])
    constants = {
        k: np.asarray(v) for k, v in variables.get("constants", {}).items()
    }

    used = set()
    for tname, path, transpose in name_map(num_blocks, only_obj, use_mcb):
        if tname not in sd:
            continue
        val = _t(sd[tname])
        if transpose:
            val = val.T
        if _set_path(params, path, val):
            used.add(tname)

    if use_mcb:
        for ref, here in (("mcb.sketch1", "sketch1"), ("mcb.sketch2", "sketch2")):
            if ref in sd and here in constants:
                constants[here] = _t(sd[ref])
                used.add(ref)

    # reference-side dead parameters we intentionally do not carry
    # (modules defined in __init__ but never read by forward —
    # `AttModel_x3.py:46-67,180-185,297,325-332`; R is live only when
    # only_obj=False)
    dead_prefixes = ("att_vis_grid.v_mlp", "att_vis_grid.input_proj",
                     "att_vis_grid.q_mlp", "att_vis_grid.v_positional_encoding",
                     "att_vis_grid.q_positional_encoding",
                     "att_syb.q_mlp", "att_syb.q_positional_encoding",
                     "MIL_NCE.bilinear", "MIL_NCE.rel_mlp")
    if only_obj:
        dead_prefixes = dead_prefixes + ("MIL_NCE.R",)
    if not use_mcb:
        dead_prefixes = dead_prefixes + ("mcb.", "cls_mcb.")
    unmatched = [k for k in sd if k not in used
                 and not k.startswith(dead_prefixes)]

    import jax.numpy as jnp

    out = dict(variables)
    out["params"] = jax.tree.map(jnp.asarray, params)
    if constants:
        out["constants"] = {k: jnp.asarray(v) for k, v in constants.items()}
    return out, unmatched

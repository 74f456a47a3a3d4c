"""JAX -> reference ``.pth`` checkpoint export (inverse of `torch_import.py`).

The reference ecosystem's consumer is ``model.load_state_dict`` over a
``module.``-prefixed state_dict (`models/eval_itp_grid_ddp_tar_gt.py:108-116`
strips the prefix, then loads *strict*). This module maps a trained
AttModelX3 param tree back onto those tensor names so a model trained here
can be evaluated/served by the unmodified reference driver — the interop
loop `torch_import` opened, closed, and a second parity proof (train here,
check logits there).

Strictness: the reference model's ``__init__`` declares parameters its
forward never reads (``v_mlp``, ``q_mlp``, ``input_proj``,
``v_positional_encoding``, ``MIL_NCE.bilinear``, ... —
`AttModel_x3.py:46-67,325-332`), which a strict ``load_state_dict`` still
demands. Pass ``template`` (a fresh reference ``model.state_dict()``) to get
a complete dict: mapped keys are overwritten, dead keys keep their template
init (the forward ignores them). Without a template the dict holds only the
mapped keys — loadable with ``strict=False``.

Layout inversions (see `torch_import.py` for the forward direction):

* flax ``Dense.kernel`` (in, out) -> torch ``Linear.weight`` (out, in);
* ``share_glove=True`` keeps ONE table here; the reference holds three
  copies (`AttModel_x3.py:36-41`), so the single table fans out to all
  three ``syb_emb.weight`` slots;
* the vis branch's positional encoding sits in a Sequential
  (``...syb_positional_encoding.0.lookup_table``) while the syb branch's is
  bare (`AttModel_x3.py:71,178`) — the canonical key set reflects that;
* MCB sketch matrices come from the ``constants`` collection.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from structured_alignment_vqa_tpu.models.torch_import import name_map

# keys name_map lists for import-robustness but the production reference
# model does not actually have, per branch (AttModel_x3.py:71,178)
_NON_CANONICAL = (
    "att_vis_grid.syb_positional_encoding.lookup_table",   # vis: Sequential
    "att_syb.syb_positional_encoding.0.lookup_table",      # syb: bare
    # the reference's branches have no decoder positional table of their own
    # when with_dec=False; the x3 production model *does* carry dec tables —
    # both stay, nothing to drop there.
)

_GLOVE_SLOTS = (
    "att_vis_grid.syb_emb.weight",
    "att_syb.syb_emb.weight",
    "MIL_NCE.syb_emb.weight",
)


def _get_path(tree: dict, path) -> Optional[np.ndarray]:
    node = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return np.asarray(node)


def export_state_dict(
    variables: Dict,
    num_blocks: int,
    only_obj: bool = True,
    use_mcb: bool = False,
    template: Optional[Dict] = None,
    ddp_prefix: bool = True,
) -> Dict:
    """Map AttModelX3 ``variables`` to a reference-layout state_dict.

    Returns ``{name: torch.Tensor}`` (f32). With ``template`` the result has
    exactly the template's key set (strict-loadable); without, only the
    mapped keys. ``ddp_prefix`` emits ``module.``-prefixed names, matching
    the reference's DDP checkpoints (`main_itp_ddp_tar_super_node.py:427`).
    """
    import torch

    params = variables["params"]
    constants = variables.get("constants", {})
    tmpl = {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in template.items()} if template is not None else None

    out: Dict[str, np.ndarray] = {}
    for tname, path, transpose in name_map(num_blocks, only_obj, use_mcb):
        val = _get_path(params, path)
        if val is None:
            continue
        if tmpl is not None:
            if tname not in tmpl:
                continue
        elif tname in _NON_CANONICAL:
            continue
        out[tname] = val.T if transpose else val

    # share_glove: one table here -> three reference copies
    shared = _get_path(params, ("glove", "table"))
    if shared is not None:
        for slot in _GLOVE_SLOTS:
            if tmpl is None or slot in tmpl:
                out[slot] = shared

    if use_mcb:
        for here, ref in (("sketch1", "mcb.sketch1"), ("sketch2", "mcb.sketch2")):
            if here in constants and (tmpl is None or ref in tmpl):
                out[ref] = np.asarray(constants[here])

    if tmpl is not None:
        missing = [k for k in out if k not in tmpl]
        if missing:
            raise ValueError(f"exported keys absent from template: {missing}")
        for k, v in tmpl.items():
            if k in out:
                want = tuple(v.shape)
                got = tuple(out[k].shape)
                if want != got:
                    raise ValueError(
                        f"shape mismatch at {k}: exporting {got}, "
                        f"reference expects {want}"
                    )
            else:
                out[k] = np.asarray(
                    v.detach().cpu().numpy() if hasattr(v, "detach") else v
                )

    prefix = "module." if ddp_prefix else ""
    return {
        prefix + k: torch.from_numpy(np.ascontiguousarray(v, dtype=np.float32))
        for k, v in out.items()
    }


def save_pth(path: str, variables: Dict, num_blocks: int, **kw) -> None:
    """``torch.save`` an exported state_dict, reference ``model_{e}.pth`` style."""
    import torch

    torch.save(export_state_dict(variables, num_blocks, **kw), path)

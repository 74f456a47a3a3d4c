"""Train here, eval THERE: run the actual reference PyTorch model on a
checkpoint trained by this framework and compare its answers head-to-head.

This is the full interop loop VERDICT r2 #8 asked for: an orbax checkpoint
from a real training run is exported with `models/torch_export.py` to a
``module.``-prefixed state_dict, the unmodified reference ``AttModel_x3``
strict-loads it exactly the way `eval_itp_grid_ddp_tar_gt.py:107-116` does,
and both models answer the same val batches. Reported:

* **agreement** — fraction of valid samples where the reference argmax
  equals this framework's argmax (the interop number; ~1.0 means the
  exported checkpoint IS the trained model, not merely load-compatible);
* accuracy of each side under the reference's counting rule
  (`main_itp_ddp_tar_super_node.py:126-127`): the numerator is restricted to
  in-vocab answers (answer != 0) but the denominator is the full valid batch
  (``cnt += batch_size``), matching this repo's `losses.py:batch_metrics` so
  the number is directly comparable to the trainer's logged val accuracy.

Everything runs f32 on CPU (the reference has no TPU path; ``.cuda()`` is
no-op'd the same way the parity suite does it) — safe to run while the
attached chip is busy.

Usage:
  PYTHONPATH=. python scripts/eval_in_reference.py \
      --root /tmp/learnprobe_prod --weight_dir /tmp/learnprobe_prod_run/checkpoints \
      --epoch 40 --batches 4
"""

from __future__ import annotations

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/models"

# The prod recipe's model/data surface (scripts/learn_probe.py --preset prod),
# minus training-only flags; f32 (no --bf16) so the comparison isolates the
# export, not bf16 rounding.
PROD_FLAGS = [
    "--model_v", "3", "--only_obj", "--with_loc", "--decMask",
    "--with_MILNCE_loss", "--pred_rel",
    "--batch_size", "128", "--maxlen", "450", "--maxlen_q", "30",
    "--maxlen_v", "50", "--hidden_size", "512", "--hidden_size_mil", "1024",
    "--num_blocks", "6", "--num_heads", "8",
    "--min_cnt", "50", "--topN", "5", "--bbox_bin_num", "32",
    "--vocab_size", "407000", "--glove_dim", "300",
    "--share_glove", "--dropout_rate", "0.2", "--num_workers", "2",
    "--platform", "cpu",
]

# The obj+rel interop config (VERDICT r3 #5b): only_obj=False so the relation
# MIL branch — and therefore the export map's R / relation rows — is
# exercised by the reference too. Matches scripts/train_objrel_small.sh-style
# CPU runs (small scale; the point is the export map, not accuracy).
OBJREL_SMALL_FLAGS = [
    "--model_v", "3", "--with_loc", "--decMask", "--with_MILNCE_loss",
    "--batch_size", "32", "--maxlen", "128", "--maxlen_q", "12",
    "--maxlen_v", "12", "--hidden_size", "64", "--hidden_size_mil", "32",
    # 4 is the reference's floor: `AttModel_vis_grid.forward` hardcodes its
    # stage boundaries (blocks 0-1 diag, 2-3 cross, 4+ full graph,
    # `AttModel_x3.py:125-140`), so num_blocks<4 crashes the reference
    "--num_blocks", "4", "--num_heads", "2",
    "--min_cnt", "50", "--topN", "2", "--bbox_bin_num", "16",
    # the reference hardcodes the 407k x 300 table (`AttModel_x3.py:36,41`),
    # so the interop run must too — the sparse-table path keeps the CPU
    # training step cheap despite it
    "--vocab_size", "407000", "--glove_dim", "300",
    "--share_glove", "--dropout_rate", "0.2", "--num_workers", "2",
    "--platform", "cpu",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/learnprobe_prod")
    p.add_argument("--weight_dir", default="/tmp/learnprobe_prod_run/checkpoints")
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--split", default="val")
    p.add_argument("--config", choices=["prod", "objrel_small"], default="prod",
                   help="flag preset; objrel_small exercises the relation "
                        "branch's export map (only_obj=False)")
    args = p.parse_args()
    flags = PROD_FLAGS if args.config == "prod" else OBJREL_SMALL_FLAGS
    only_obj = "--only_obj" in flags

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    from structured_alignment_vqa_tpu.data.dataset import BatchLoader, GQASuperNodeDataset
    from structured_alignment_vqa_tpu.models import AttModelX3
    from structured_alignment_vqa_tpu.models.torch_export import export_state_dict
    from structured_alignment_vqa_tpu.parallel import create_train_state
    from structured_alignment_vqa_tpu.parallel.train_step import adam
    from structured_alignment_vqa_tpu.train.main import build_parser, configs_from_args
    from structured_alignment_vqa_tpu.train.predict import make_predict_step
    from structured_alignment_vqa_tpu.utils.checkpoint import load_params_for_eval

    cli = build_parser().parse_args(
        flags + ["--data_dir_azure", args.root, "--output_dir", "/tmp/eval_in_ref"]
    )
    model_cfg, train_dc, val_dc, trainer_cfg = configs_from_args(cli)
    dc = val_dc if args.split == "val" else train_dc

    ds = GQASuperNodeDataset(args.split, dc)
    loader = BatchLoader(ds, trainer_cfg.batch_size, shuffle=False, drop_last=False,
                         num_threads=1)

    # --- this framework's side: restore + jitted ensemble argmax ---
    model = AttModelX3(model_cfg)
    batches = []
    for b in loader:
        batches.append(jax.device_get(b))
        if len(batches) >= args.batches:
            break
    state = create_train_state(model, jax.random.key(0), batches[0], adam(1e-4))
    state = load_params_for_eval(args.weight_dir, state, args.epoch)
    predict = make_predict_step(model)

    # --- reference side: export -> strict load -> eval() ---
    sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU harness, like the parity suite
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import AttModel_x3 as ref_mod

    glove = types.SimpleNamespace(vectors=torch.zeros(1, 300))
    torch.manual_seed(0)
    with torch.no_grad():  # AttModel_x3.py:38 writes into a leaf Parameter in-place
        ref = ref_mod.AttModel(
            glove, model_cfg.hidden_size, model_cfg.hidden_size_mil,
            model_cfg.num_classes, model_cfg.maxlen_q, model_cfg.maxlen,
            model_cfg.maxlen_v, model_cfg.num_blocks, model_cfg.num_heads,
            model_cfg.dropout_rate, 0.1, max(model_cfg.num_relations, 1),
            only_obj,
        )
    variables = {"params": jax.device_get(state.params)}
    sd = export_state_dict(
        variables, model_cfg.num_blocks, only_obj=only_obj, use_mcb=False,
        template=ref.state_dict(), ddp_prefix=True,
    )
    # the consumer's own loading convention: strip `module.`, strict load
    ref.load_state_dict({k[len("module."):]: v for k, v in sd.items()}, strict=True)
    ref.eval()

    def tt(x, dtype=None):
        t = torch.from_numpy(np.asarray(x))
        return t.to(dtype) if dtype else t

    n_agree = n_valid = 0
    ours_correct = ref_correct = n_scored = 0
    for bi, b in enumerate(batches):
        ours = np.asarray(predict(state, b))
        with torch.no_grad():
            lc, lv, ls_, _, _ = ref(
                tt(b.vis_fea, torch.float32), tt(b.vis_mask, torch.float32),
                tt(b.q_ipt, torch.long), tt(b.q_mask, torch.float32),
                tt(b.q_graph, torch.float32), tt(b.macro_ipt, torch.long),
                tt(b.macro_mask, torch.float32), tt(b.macro_graph, torch.float32),
                tt(b.macro_obj_loc, torch.long), tt(b.micro_pos_obj, torch.long),
                tt(b.micro_neg_obj, torch.long), tt(b.micro_obj_mask, torch.float32),
                tt(b.micro_pos_rel, torch.long), tt(b.micro_neg_rel, torch.long),
                tt(b.micro_pos_rel_loc, torch.long), tt(b.micro_neg_rel_loc, torch.long),
                decMask=True, mcb=False,
            )
        log_sm = (torch.log_softmax(lv, -1) + torch.log_softmax(ls_, -1)
                  + torch.log_softmax(lc, -1))
        theirs = log_sm.argmax(-1).numpy()

        valid = np.asarray(b.sample_valid).astype(bool)
        ans = np.asarray(b.answer)
        n_valid += int(valid.sum())
        n_agree += int((ours[valid] == theirs[valid]).sum())
        # the reference's counting rule (`main:126-127`): numerator over
        # in-vocab answers only, denominator the full valid batch — same as
        # losses.py:batch_metrics, so this matches the trainer's val accuracy
        scored = valid & (ans != 0)
        n_scored += int(valid.sum())
        ours_correct += int((ours[scored] == ans[scored]).sum())
        ref_correct += int((theirs[scored] == ans[scored]).sum())
        print(f"batch {bi}: agree {int((ours[valid] == theirs[valid]).sum())}"
              f"/{int(valid.sum())}", flush=True)

    print(f"\nagreement: {n_agree}/{n_valid} = {n_agree / max(n_valid, 1):.4f}")
    print(f"accuracy (in-vocab numerator / full-valid-batch denominator, "
          f"n={n_scored}): ours {ours_correct / max(n_scored, 1):.4f}  "
          f"reference-with-exported-weights {ref_correct / max(n_scored, 1):.4f}")


if __name__ == "__main__":
    main()

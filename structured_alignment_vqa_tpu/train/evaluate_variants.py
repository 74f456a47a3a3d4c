"""Ablation-model eval driver — the `eval_itp_grid_ddp_tar_gt.py` counterpart.

The reference's standalone eval maps ``--model_v`` 1/2/2+dec/3 onto the
`transformers/` model files and runs the GT-scene-graph loader
(`eval_itp_grid_ddp_tar_gt.py:96-126`). Here:

* model_v 1 -> 'x', 2 -> 'x2' (``--with_dec`` -> 'x2_dec'), plus any name from
  `models/variants.VARIANTS` via ``--variant``;
* loader: any preset from `data/node_graph_dataset.config_for_variant`
  (default 'itp_gt', the reference eval's loader);
* single-logits eval: smoothed CE + in-vocab accuracy (`eval...:37-79`).
"""

from __future__ import annotations

import argparse
import datetime

import jax
import jax.numpy as jnp

from structured_alignment_vqa_tpu.data.node_graph_dataset import (
    NodeGraphDataset,
    collate_node_graph,
    config_for_variant,
)
from structured_alignment_vqa_tpu.models.config import ModelConfig
from structured_alignment_vqa_tpu.models.variants import build_variant
from structured_alignment_vqa_tpu.ops.layers import label_smoothing
from structured_alignment_vqa_tpu.utils.logging import setup_logging
from structured_alignment_vqa_tpu.utils.metrics import AverageMeter

# model_v 3 is intentionally absent: the reference eval driver's v3 path is
# dead code — it imports the 14-arg AttModel_x3 and calls it with 9 args
# (`eval_itp_grid_ddp_tar_gt.py:11,106`), so it cannot have been run. The
# production x3 eval lives in train/evaluate.py; the x3_ori ablation (MIL
# inputs, 5-tuple output) is reachable via --variant plus the production
# loader, not this driver's id-based batch format.
MODEL_V_TO_VARIANT = {1: "x", 2: "x2"}


def _square(mask_1d: jax.Array) -> jax.Array:
    """(B, L) validity -> (B, L, L) top-left square (the x2_dec batch format)."""
    return mask_1d[:, :, None] * mask_1d[:, None, :]


# variants taking the (vis, vis_mask2d, q, q_mask2d, ...) block-diag signature
DEC_FAMILY = {"x2_dec", "x2_dec_ori", "x2_mlp_dec", "x2_syb_dec",
              "x2_fusion_dec", "x2_fusion_dec_relatt"}
# variants taking 1-D masks + returning (logits, att_weights); x6 additionally
# takes idx_of_obj (use --loader itp_bbox_q so it is emitted)
MIL_FAMILY = {"x5_dec_mil", "x6_dec_mil", "x7_dec_mil"}


def eval_batches(model, params, batches, logger, log_steps=100, family="maxpool"):
    """Single-logits eval loop (`eval_itp_grid_ddp_tar_gt.py:37-79`)."""
    loss_meter = AverageMeter()
    n_correct = 0.0
    n_total = 0.0

    @jax.jit
    def step(params, vis, q, qm, qg, node, nm, ng, idx_of_obj, answer, valid):
        if family == "dec":
            vm2 = _square(jnp.ones(vis.shape[:2], jnp.float32))
            logits = model.apply(
                params, vis, vm2, q, _square(qm), qg, node, _square(nm), ng
            )
        elif family == "mil":
            vm1 = jnp.ones(vis.shape[:2], jnp.float32)
            args = (vis, vm1, q, qm, qg, node, nm, ng)
            if "x6" in type(model).__name__.lower():
                args = args + (idx_of_obj,)
            logits = model.apply(params, *args)
        else:
            logits = model.apply(params, vis, q, qm, qg, node, nm, ng)
        if isinstance(logits, tuple):
            logits = logits[0]
        log_sm = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        one_hot = label_smoothing(jax.nn.one_hot(answer, logits.shape[-1]))
        per = -jnp.sum(one_hot * log_sm, -1)
        v = valid.astype(jnp.float32)
        pred = jnp.argmax(log_sm, -1)
        in_vocab = (answer != 0).astype(jnp.float32) * v
        return (jnp.sum(per * v), jnp.sum((pred == answer) * in_vocab), jnp.sum(v))

    for i, b in enumerate(batches):
        loss_sum, corr, n = step(
            params,
            jnp.asarray(b["vis_fea"]), jnp.asarray(b["q_ipt"], jnp.int32),
            jnp.asarray(b["q_mask"]), jnp.asarray(b["q_graph"]),
            jnp.asarray(b["node_ipt"], jnp.int32), jnp.asarray(b["node_mask"]),
            jnp.asarray(b["node_graph"]), jnp.asarray(b["idx_of_obj"], jnp.int32),
            jnp.asarray(b["answer"], jnp.int32), jnp.asarray(b["sample_valid"]),
        )
        if float(n) > 0:
            loss_meter.update(float(loss_sum) / float(n), int(n))
        n_correct += float(corr)
        n_total += float(n)
        if (i + 1) % log_steps == 0:
            logger.info("Step [%d], Avg Loss: %s", i + 1, loss_meter.avg)
    return loss_meter.avg, n_correct, n_total


def main(argv=None):
    ap = argparse.ArgumentParser(description="SA-VQA variant eval driver")
    ap.add_argument("--data_dir_azure", required=True)
    ap.add_argument("--output_dir", default="./tmp")
    ap.add_argument("--model_v", type=int, default=2)
    ap.add_argument("--variant", type=str, default=None,
                    help="explicit variant name, overrides --model_v")
    ap.add_argument("--with_dec", action="store_true")
    ap.add_argument("--loader", type=str, default="itp_gt")
    ap.add_argument("--split", type=str, default="val")
    ap.add_argument("--q_tar_fn", default="val.tar")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--maxlen", type=int, default=300)
    ap.add_argument("--maxlen_q", type=int, default=50)
    ap.add_argument("--maxlen_v", type=int, default=49)
    ap.add_argument("--hidden_size", type=int, default=512)
    ap.add_argument("--num_blocks", type=int, default=6)
    ap.add_argument("--num_heads", type=int, default=8)
    ap.add_argument("--min_cnt", type=int, default=10)
    ap.add_argument("--vocab_size", type=int, default=407000)
    ap.add_argument("--glove_dim", type=int, default=300)
    ap.add_argument("--weight_dir", type=str, default=None)
    ap.add_argument("--log_steps", type=int, default=100)
    args = ap.parse_args(argv)

    variant = args.variant
    if variant is None:
        variant = MODEL_V_TO_VARIANT[args.model_v]
        if args.model_v == 2 and args.with_dec:
            variant = "x2_dec"

    logger = setup_logging(args.output_dir, jax.process_index())
    dcfg = config_for_variant(
        args.loader, args.data_dir_azure, q_tar=args.q_tar_fn,
        maxlen=args.maxlen, min_cnt=args.min_cnt,
    )
    ds = NodeGraphDataset(args.split, dcfg)

    mcfg = ModelConfig(
        num_classes=len(ds.ans_w2id) + 1,
        num_relations=len(ds.builder.gt_relation_clean) + 1,
        vocab_size=args.vocab_size, glove_dim=args.glove_dim,
        hidden_size=args.hidden_size, num_blocks=args.num_blocks,
        num_heads=args.num_heads, dropout_rate=0.0,
        maxlen=args.maxlen, maxlen_q=args.maxlen_q, maxlen_v=args.maxlen_v,
        stage1_blocks=min(2, args.num_blocks), stage2_blocks=min(4, args.num_blocks),
    )
    model = build_variant(variant, mcfg)

    lv, ls, lq = args.maxlen_v, args.maxlen - args.maxlen_q, args.maxlen_q
    batches = []
    pool = []
    for i in range(len(ds)):
        s = ds.sample(i)
        pool.append(s)
        if len(pool) == args.batch_size:
            batches.append(collate_node_graph(pool, lv, ls, lq))
            pool = []
    if pool:
        batches.append(collate_node_graph(pool + [None] * (args.batch_size - len(pool)), lv, ls, lq))

    family = "dec" if variant in DEC_FAMILY else ("mil" if variant in MIL_FAMILY else "maxpool")
    b0 = batches[0]
    if family == "dec":
        qm2 = _square(jnp.asarray(b0["q_mask"]))
        nm2 = _square(jnp.asarray(b0["node_mask"]))
        vm2 = _square(jnp.ones(b0["vis_fea"].shape[:2], jnp.float32))
        init_args = (
            jnp.asarray(b0["vis_fea"]), vm2, jnp.asarray(b0["q_ipt"], jnp.int32),
            qm2, jnp.asarray(b0["q_graph"]),
            jnp.asarray(b0["node_ipt"], jnp.int32), nm2,
            jnp.asarray(b0["node_graph"]),
        )
    elif family == "mil":
        vm1 = jnp.ones(b0["vis_fea"].shape[:2], jnp.float32)
        init_args = (
            jnp.asarray(b0["vis_fea"]), vm1, jnp.asarray(b0["q_ipt"], jnp.int32),
            jnp.asarray(b0["q_mask"]), jnp.asarray(b0["q_graph"]),
            jnp.asarray(b0["node_ipt"], jnp.int32), jnp.asarray(b0["node_mask"]),
            jnp.asarray(b0["node_graph"]),
        )
        if variant == "x6_dec_mil":
            init_args = init_args + (jnp.asarray(b0["idx_of_obj"], jnp.int32),)
    else:
        init_args = (
            jnp.asarray(b0["vis_fea"]), jnp.asarray(b0["q_ipt"], jnp.int32),
            jnp.asarray(b0["q_mask"]), jnp.asarray(b0["q_graph"]),
            jnp.asarray(b0["node_ipt"], jnp.int32), jnp.asarray(b0["node_mask"]),
            jnp.asarray(b0["node_graph"]),
        )
    params = jax.jit(model.init)(jax.random.key(0), *init_args)
    if args.weight_dir:
        import orbax.checkpoint as ocp
        mgr = ocp.CheckpointManager(args.weight_dir)
        step = mgr.latest_step()
        params = mgr.restore(step, args=ocp.args.StandardRestore(params))
        mgr.close()

    loss, corr, n = eval_batches(
        model, params, batches, logger, args.log_steps, family=family
    )
    acc = corr / max(n, 1)
    logger.info(
        "Time %s, Eval[%s/%s] Loss: %s, accuracy: %s/%s = %s",
        datetime.datetime.now(), variant, args.split, loss, corr, n, acc,
    )
    return loss, acc


if __name__ == "__main__":
    main()

"""Training CLI — flag-compatible with the reference driver.

``python -m structured_alignment_vqa_tpu.train.main --model_v 3 --only_obj ...``
accepts the reference's flag surface (`main_itp_ddp_tar_super_node.py:432-501`)
including the Azure env-var defaults PT_DATA_DIR / PT_OUTPUT_DIR. Distributed
execution replaces ``mp.spawn`` + NCCL rendezvous with
``jax.distributed.initialize`` (single-controller; one process per host).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from structured_alignment_vqa_tpu.data.dataset import DataConfig
from structured_alignment_vqa_tpu.data.vocab import load_answer_vocab
from structured_alignment_vqa_tpu.models.config import ModelConfig
from structured_alignment_vqa_tpu.models.glove import build_glove_table
from structured_alignment_vqa_tpu.train.loop import TrainerConfig, train


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SA-VQA TPU training driver")
    # data paths (reference defaults, `main:435-450`)
    p.add_argument("--data_dir_azure", type=str, default=os.environ.get("PT_DATA_DIR", "./tmp"))
    p.add_argument("--fea_tar_fn_train", default="gt_bua_npz.tar")
    p.add_argument("--q_tar_fn_train", default="train.tar")
    p.add_argument("--g_tar_fn_train", default="gt_bua_npz.tar")
    p.add_argument("--fea_tar_fn_val", default="gt_bua_npz.tar")
    p.add_argument("--q_tar_fn_val", default="val.tar")
    p.add_argument("--g_tar_fn_val", default="gt_bua_npz.tar")
    p.add_argument("--gt_relation_fn", default="GT_relations_dict_compsite.json")
    p.add_argument("--obj_vocab_fn", type=str, default="objects_vocab.txt")
    p.add_argument("--attr_vocab_fn", type=str, default="attributes_vocab.txt")
    p.add_argument("--bbox_bin_num", type=int, default=64)
    p.add_argument("--enc_vocab_fn", type=str, default="preprocessed/de.vocab.composite2.tsv")
    p.add_argument("--ans_vocab_fn", type=str, default="preprocessed/en.vocab.tsv")
    p.add_argument("--glove_path", type=str, default=None,
                   help="GloVe .txt/.npy; defaults to <data_dir>/vector_cache if present")

    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--output_dir", type=str, default=os.environ.get("PT_OUTPUT_DIR", "./tmp"))

    # model hyperparameters (`main:457-469`)
    p.add_argument("--maxlen", type=int, default=300)
    p.add_argument("--maxlen_q", type=int, default=50)
    p.add_argument("--maxlen_v", type=int, default=49)
    p.add_argument("--hidden_size", type=int, default=512)
    p.add_argument("--hidden_size_mil", type=int, default=64)
    p.add_argument("--num_blocks", type=int, default=6)
    p.add_argument("--num_epochs", type=int, default=40)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--min_cnt", type=int, default=10)
    p.add_argument("--dropout_rate", type=float, default=0.5)
    p.add_argument("--dropout_rate_mcb", type=float, default=0.1)
    p.add_argument("--aug_rate", type=float, default=0.5)
    p.add_argument("--topN", type=int, default=1)

    # variant switches (`main:471-488`)
    for flag in (
        "sinusoid", "with_dec", "with_loc", "with_smooth_labeling", "with_bbox",
        "with_rank_loss", "with_MILNCE_loss", "with_gt_relation", "local_debug",
        "decMask", "visGraph", "mcb", "dataAug", "gtNode", "gtWpred",
        "GTRelPredNode", "only_obj", "pred_rel",
    ):
        p.add_argument(f"--{flag}", action="store_true")

    p.add_argument("--log_steps", type=int, default=100)
    p.add_argument("--log_steps_val", type=int, default=100)
    p.add_argument("--model_v", type=int, default=3)
    p.add_argument("--pool", type=str, default="mean")

    # distributed (reference: ngpus/nr/num_nodes; here: jax.distributed)
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 for multi-host init")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--no_resume", action="store_true")

    # TPU-native extras
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute dtype")
    p.add_argument("--share_glove", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vocab_size", type=int, default=407000,
                   help="GloVe-backed embedding rows (reference: 407000)")
    p.add_argument("--glove_dim", type=int, default=300)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. 'cpu' for --local_debug-style runs)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a JAX profiler trace over N training steps")
    p.add_argument("--n_pack", type=int, default=1,
                   help="sequence packing: up to N training samples per row "
                        "(only_obj only; measured throughput in docs/DESIGN.md)")
    p.add_argument("--pack_bucket", type=int, default=-1,
                   help="bucket index packed rows use (-1 = largest; 1 is the "
                        "measured production optimum, docs/DESIGN.md)")
    p.add_argument("--num_procs", type=int, default=0,
                   help="loader worker processes (0 = thread pool)")
    p.add_argument("--cache_dir", type=str, default="",
                   help="cross-epoch preprocessed-sample cache directory: the "
                        "first pass persists converted samples; later epochs "
                        "stream mmap'd arrays (data/sample_cache.py)")
    p.add_argument("--batch_replay", action="store_true",
                   help="materialize epoch-0's collated train batches and "
                        "replay them in a per-epoch-shuffled order (frozen "
                        "composition; needs --cache_dir)")
    p.add_argument("--checkpoint_every", type=int, default=1,
                   help="epochs between orbax checkpoints (reference saves "
                        "every epoch)")
    p.add_argument("--max_checkpoints", type=int, default=0,
                   help="keep only the newest N checkpoints (0 = keep all, "
                        "the reference behavior)")
    p.add_argument("--eval_every", type=int, default=1,
                   help="epochs between val/train eval passes (reference: 1; "
                        "the final epoch always evals)")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup steps before the constant reference "
                        "LR (0 = reference behavior, no warmup)")
    p.add_argument("--use_pallas", action="store_true",
                   help="use the fused Pallas kernel tier (wins on unaligned shapes)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint over encoder blocks: recompute "
                        "activations in the backward instead of saving them "
                        "— frees HBM for device-resident batches")
    p.add_argument("--sparse_table", action="store_true",
                   help="sparse/segmented Adam for the shared GloVe table: "
                        "update only the rows each batch touches "
                        "(parallel/sparse_table.py; lazy-Adam semantics — "
                        "requires --share_glove)")
    p.add_argument("--table_moments_bf16", action="store_true",
                   help="store the sparse table's Adam moments in bfloat16 "
                        "(half the 976 MB f32 moment HBM; bounded-deviation "
                        "tested)")
    p.add_argument("--resident_gb", type=float, default=8.0,
                   help="device-memory budget (GB) for pinning frozen "
                        "replay/eval batches resident in HBM — epochs then "
                        "cost zero host->device transfers (0 = stream)")
    return p


def configs_from_args(args) -> tuple[ModelConfig, DataConfig, DataConfig, TrainerConfig]:
    d = args.data_dir_azure
    w2idx, _ = load_answer_vocab(os.path.join(d, args.ans_vocab_fn), args.min_cnt)
    num_classes = len(w2idx) + 1  # + "all other" class (`main:183`)

    with open(os.path.join(d, args.gt_relation_fn)) as f:
        gt_relations = json.load(f)
    num_relations = len(set(gt_relations.values())) + 1  # + no-relation (`main:195`)

    import jax.numpy as jnp

    model_cfg = ModelConfig(
        num_classes=num_classes,
        num_relations=num_relations,
        vocab_size=args.vocab_size,
        glove_dim=args.glove_dim,
        hidden_size=args.hidden_size,
        hidden_size_mil=args.hidden_size_mil,
        num_blocks=args.num_blocks,
        # the reference hardcodes stages [0,2), [2,4), [4,N) (`AttModel_x3.py:127-139`);
        # clamp for small block counts
        stage1_blocks=min(2, args.num_blocks),
        stage2_blocks=min(4, args.num_blocks),
        num_heads=args.num_heads,
        dropout_rate=args.dropout_rate,
        dropout_rate_mcb=args.dropout_rate_mcb,
        maxlen=args.maxlen,
        maxlen_q=args.maxlen_q,
        maxlen_v=args.maxlen_v,
        topn=args.topN,
        only_obj=args.only_obj,
        use_dec_mask=args.decMask,
        use_mcb=args.mcb,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        share_glove=args.share_glove,
        use_pallas_attention=args.use_pallas,
        remat_blocks=args.remat,
    )

    def data_cfg(fea, q, g):
        return DataConfig(
            data_dir=d, fea_tar=fea, q_tar=q, g_tar=g,
            gt_relation_fn=args.gt_relation_fn,
            obj_vocab_fn=args.obj_vocab_fn, attr_vocab_fn=args.attr_vocab_fn,
            enc_vocab_fn=args.enc_vocab_fn, ans_vocab_fn=args.ans_vocab_fn,
            bbox_bin_num=args.bbox_bin_num, min_cnt=args.min_cnt,
            maxlen=args.maxlen, topn=args.topN, with_loc=args.with_loc,
            only_obj=args.only_obj, pred_rel=args.pred_rel, seed=args.seed,
        )

    train_dc = data_cfg(args.fea_tar_fn_train, args.q_tar_fn_train, args.g_tar_fn_train)
    val_dc = data_cfg(args.fea_tar_fn_val, args.q_tar_fn_val, args.g_tar_fn_val)

    trainer_cfg = TrainerConfig(
        output_dir=os.path.join(d, args.output_dir) if not os.path.isabs(args.output_dir) else args.output_dir,
        batch_size=args.batch_size,
        lr=args.lr,
        num_epochs=args.num_epochs,
        log_steps=args.log_steps,
        log_steps_val=args.log_steps_val,
        with_milnce=args.with_MILNCE_loss,
        model_parallel=args.model_parallel,
        seed=args.seed,
        resume=not args.no_resume,
        num_workers=args.num_workers,
        num_procs=args.num_procs,
        n_pack=args.n_pack,
        pack_bucket=None if args.pack_bucket < 0 else args.pack_bucket,
        cache_dir=args.cache_dir or None,
        batch_replay=args.batch_replay,
        profile_steps=args.profile_steps,
        eval_every=args.eval_every,
        warmup_steps=args.warmup_steps,
        sparse_table=args.sparse_table,
        table_moments_bf16=args.table_moments_bf16,
        resident_gb=args.resident_gb,
        checkpoint_every=args.checkpoint_every,
        max_checkpoints=args.max_checkpoints or None,
    )
    return model_cfg, train_dc, val_dc, trainer_cfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.model_v != 3:
        raise SystemExit(
            "model_v != 3: use structured_alignment_vqa_tpu.models.variants to "
            "instantiate ablation models; the training driver covers the "
            "production v3 path (as does the reference's maintained loss branch)."
        )

    if args.coordinator and args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    glove_table = None
    glove_path = args.glove_path
    if glove_path is None:
        for cand in ("glove.6B.300d.npy", "glove.6B.300d.txt"):
            c = os.path.join(args.data_dir_azure, "vector_cache", cand)
            if os.path.exists(c):
                glove_path = c
                break
    if glove_path:
        glove_table = build_glove_table(glove_path=glove_path)

    model_cfg, train_dc, val_dc, trainer_cfg = configs_from_args(args)
    return train(model_cfg, train_dc, trainer_cfg, val_data_cfg=val_dc, glove_table=glove_table)


if __name__ == "__main__":
    main()

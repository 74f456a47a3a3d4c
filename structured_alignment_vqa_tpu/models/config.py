"""Model configuration: the variant matrix as data, not file forks.

The reference encodes its ablation space as 17 separate model files under
`transformers/` plus argparse flags (`--model_v`, `--only_obj`, `--mcb`,
`--decMask`, `--pred_rel`, ... — `main_itp_ddp_tar_super_node.py:432-501`).
Here one dataclass covers the production model and the knobs that
distinguish the variants; `models/variants.py` maps reference model names to
configs.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters of the SA-VQA model family.

    Defaults follow the production cloud submission (`submit.py:72-118`):
    batch 32/device, hidden 512, 6 blocks, 8 heads, maxlen 450 (obj-only),
    topN 5, hidden_size_mil 1024 (obj-only), dropout 0.5.
    """

    num_classes: int = 1000
    num_relations: int = 310

    # GloVe-backed embedding table: 400k GloVe rows + 7k specials
    # (`AttModel_x3.py:13-18,36-38`).
    vocab_size: int = 407000
    glove_dim: int = 300
    vis_fea_dim: int = 2048

    hidden_size: int = 512
    hidden_size_mil: int = 1024
    num_blocks: int = 6
    num_heads: int = 8
    dropout_rate: float = 0.5
    dropout_rate_mcb: float = 0.1

    maxlen: int = 450      # macro graph + question node budget
    maxlen_q: int = 40
    maxlen_v: int = 100    # max visual regions
    topn: int = 5

    # Variant switches (reference CLI flags).
    only_obj: bool = True        # --only_obj: drop the relation MIL branch
    use_dec_mask: bool = True    # --decMask: decoder cross-attention mask
    use_mcb: bool = False        # --mcb: MCB fusion head instead of concat
    mcb_out: int = 16000         # `AttModel_x3.py:502`

    # Number of attention blocks running each graph stage in the encoders:
    # blocks [0, stage1) use graph_diag, [stage1, stage2) use graph_cross,
    # [stage2, num_blocks) use the full graph (`AttModel_x3.py:127-139`).
    stage1_blocks: int = 2
    stage2_blocks: int = 4

    # The reference mutates `graph_cross` in place when building `graph`
    # (`AttModel_x3.py:118-122` — `graph = graph_cross` aliases the tensor),
    # so its cross-modality stage actually runs on the *full* graph. False
    # replicates that behavior bit-for-bit; True uses the pristine 1-mask
    # cross graph the code appears to have intended.
    distinct_cross_stage: bool = False

    # TPU-native knobs (no reference equivalent).
    compute_dtype: jnp.dtype = jnp.float32
    share_glove: bool = False    # one GloVe table instead of three copies
    use_pallas_attention: bool = False
    remat_blocks: bool = False   # jax.checkpoint over encoder blocks
    # Sequence-parallel encoder attention: mesh axis name to ring-shard the
    # encoder token sequence over (see `ops/ring_attention.py`). Requires an
    # ambient mesh (parallel/context.use_mesh) carrying that axis; engages
    # only in the encoder self-attention blocks.
    seq_axis: "str | None" = None
    # sequence-parallel implementation: "ring" (ppermute, graph row-sharded,
    # any n dividing L) or "ulysses" (all-to-all head sharding, lower comm,
    # graph replicated, n must divide num_heads) — docs/DESIGN.md
    seq_impl: str = "ring"
    # Weight-only int8 serving: GloVe tables + classifier heads hold int8
    # weights with f32 scales (`ops/quant.py`); params must come from
    # `quantize_params` over a trained float checkpoint. Serving only.
    int8_serving: bool = False

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def validate(self) -> None:
        if self.hidden_size % self.num_heads:
            raise ValueError("hidden_size must be divisible by num_heads")
        if not (0 < self.stage1_blocks <= self.stage2_blocks <= self.num_blocks):
            raise ValueError("stage boundaries must satisfy 0 < s1 <= s2 <= num_blocks")


def tiny_test_config(**kw) -> ModelConfig:
    """Small config for unit tests: tiny vocab, 2 heads, 3 blocks."""
    base = dict(
        num_classes=11,
        num_relations=7,
        vocab_size=50,
        glove_dim=12,
        vis_fea_dim=16,
        hidden_size=16,
        hidden_size_mil=8,
        num_blocks=3,
        num_heads=2,
        dropout_rate=0.0,
        maxlen=32,
        maxlen_q=8,
        maxlen_v=6,
        topn=2,
        stage1_blocks=1,
        stage2_blocks=2,
        mcb_out=24,
    )
    base.update(kw)
    return ModelConfig(**base)

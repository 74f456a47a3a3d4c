"""Model families. The flagship is AttModelX3 (the reference's production
`models/AttModel_x3.py`); the ablation matrix that the reference keeps as 17
file forks under `transformers/` is expressed here as configuration
(`config.py` + `variants.py`) over shared modules.
"""

from structured_alignment_vqa_tpu.models.config import ModelConfig
from structured_alignment_vqa_tpu.models.att_model_x3 import (
    AttModelX3,
    VisualEncoder,
    SymbolicEncoder,
    MILNCEModule,
    build_stage_graphs,
)
from structured_alignment_vqa_tpu.models.glove import build_glove_table, SpecialIds

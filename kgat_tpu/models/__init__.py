"""Model families. Currently: KGAT (the reference's single model family)."""

from kgat_tpu.models.kgat import (  # noqa: F401
    KGATConfig,
    init_params,
    compute_attention,
    propagate,
    cf_scores,
    cf_loss,
    kg_loss,
)

from hdrtv_tpu.models.hdrtvnet import (  # noqa: F401
    ModelConfig,
    ensemble_agcm_le,
    hg_composite,
    make_mask,
)

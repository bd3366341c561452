from mrfp_tpu.models.mrfp import MRFP, PerturbArgs
from mrfp_tpu.models.deepv3_zoo import (
    DeepV3Plus,
    MODEL_REGISTRY,
    build_cov_layers,
    covstat_update,
    get_net,
    whitening_loss_from_cov,
)

__all__ = [
    "MRFP", "PerturbArgs",
    "DeepV3Plus", "MODEL_REGISTRY", "build_cov_layers", "covstat_update",
    "get_net", "whitening_loss_from_cov",
]

from mrfp_tpu.perturb.np_plus import normalization_perturbation_plus
from mrfp_tpu.perturb.oc_branch import (
    OCParams,
    oc_apply,
    oc_init,
    oc_maybe_resample,
)
from mrfp_tpu.perturb.fft_style import hpf, lpf, phot

__all__ = [
    "normalization_perturbation_plus",
    "OCParams", "oc_apply", "oc_init", "oc_maybe_resample",
    "hpf", "lpf", "phot",
]

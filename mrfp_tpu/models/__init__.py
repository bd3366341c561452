from mrfp_tpu.models.mrfp import MRFP, PerturbArgs

__all__ = ["MRFP", "PerturbArgs"]

"""mrfp_tpu — a TPU-native framework for domain-generalized semantic segmentation.

Re-implements the full capability surface of the MRFP reference (CVPR 2024,
"Learning Generalizable Semantic Segmentation from Sim-2-Real with
Multi-Resolution Feature Perturbation") as an idiomatic JAX/Flax/Pallas stack:

- ``mrfp_tpu.core``     config tree, device mesh / sharding, RNG discipline
- ``mrfp_tpu.ops``      TPU compute primitives (torch-exact resizes, fused
                        Pallas kernels for the perturbation ops, confusion
                        matrices on device)
- ``mrfp_tpu.nn``       norm/whitening layer zoo + backbones (ResNet family,
                        MobileNetV2, ShuffleNetV2, SE-ResNeXt, WiderResNet)
- ``mrfp_tpu.perturb``  NP+ statistics noise, the overcomplete (OC/HRFP)
                        branch with in-graph weight resampling, FFT transforms
- ``mrfp_tpu.models``   MRFP / MRFP+ / DeepLabV3+ model families
- ``mrfp_tpu.data``     dataset catalog, label maps, transform pipeline
- ``mrfp_tpu.train``    pjit train/eval steps, SGD+poly, checkpointing,
                        PyTorch checkpoint importer
- ``mrfp_tpu.parallel`` mesh axes and sharding rules (DP over ICI; sync-BN and
                        sync-whitening fall out of GSPMD batch reductions)
- ``mrfp_tpu.utils``    logging, profiling hooks, misc

Design note: everything under ``jax.jit`` over a ``jax.sharding.Mesh`` — the
reference's NCCL collectives (DDP grad all-reduce, SyncBatchNorm,
SyncSwitchWhiten's dist.all_reduce) all become plain batch-axis reductions
that GSPMD lowers to ICI collectives automatically.
"""

__version__ = "0.1.0"

"""Parallelism layer.

The reference's distributed substrate (SURVEY.md §2.3) maps to:

| reference                         | here                                   |
|-----------------------------------|----------------------------------------|
| nn.DataParallel / DDP grad sync   | batch sharded over mesh 'data' + jit   |
| SyncBatchNorm NCCL moments        | BN reduces over the logical batch      |
| SyncSwitchWhiten dist.all_reduce  | whitening stats reduce over batch      |
| NCCL TCP rendezvous               | jax.distributed.initialize (multi-host)|

TP/PP/SP/EP are absent in the reference (CNN, no attention); the mesh keeps
a 'model' axis so tensor sharding can be layered in without API changes.
"""

from mrfp_tpu.core.mesh import batch_sharding, create_mesh, replicated, shard_batch
from mrfp_tpu.parallel.dist import initialize_distributed

__all__ = ["batch_sharding", "create_mesh", "replicated", "shard_batch",
           "initialize_distributed"]

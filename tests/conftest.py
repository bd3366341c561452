"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding/collective behavior is
validated on the host platform with forced device count (the same mechanism
the driver uses for the multi-chip dry run). A pytest plugin in this
environment imports jax before conftest runs, so env vars alone are not
enough — set the config explicitly.
"""

import os

# Force CPU: the ambient environment points JAX at a TPU (JAX_PLATFORMS=axon)
# whose default matmul precision is bf16 — parity tests need fp32 exactness.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
# The axon plugin env var overrides JAX_PLATFORMS at plugin registration
# AND makes utils.tpu_health.tpu_platform() report a TPU — in-process tests
# would then run REAL device probes (against a possibly wedged tunnel,
# violating the one-client rule). Tests are genuinely CPU-only; drop it.
# (Subprocess-spawning tests already pop it from their own env copies.)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_num_cpu_devices", 8)

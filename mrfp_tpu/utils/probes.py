"""Debug probes — the feature-similarity instrumentation the reference keeps
as commented leftovers (utils_main.py:137-160: cosine-similarity dumps
between backbone / OC features and constants).

``cosine_sim`` computes mean pairwise cosine similarity between flattened
feature batches; ``FeatureProbe`` appends values to a file like the
reference's dump-to-txt pattern, but works on any pytree of features.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cosine_sim(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Mean cosine similarity between per-sample flattened features."""
    af = a.reshape(a.shape[0], -1).astype(jnp.float32)
    bf = b.reshape(b.shape[0], -1).astype(jnp.float32)
    num = jnp.sum(af * bf, axis=-1)
    den = jnp.linalg.norm(af, axis=-1) * jnp.linalg.norm(bf, axis=-1)
    return jnp.mean(num / jnp.maximum(den, eps))


class FeatureProbe:
    def __init__(self, path: str):
        self.path = path

    def log(self, a, b) -> float:
        v = float(cosine_sim(jnp.asarray(a), jnp.asarray(b)))
        with open(self.path, "a") as f:
            f.write(f"{v}\n")
        return v

"""RNG discipline.

The reference draws host-side randomness mid-forward (three `random.random()`
gates at deepv3.py:281-283, host-seeded torch RNG mutating device weights at
deepv3.py:290-306, `torch.normal` inside NP+ at deepv3.py:274-275). Here every
random draw flows from a single per-step key, split by role, so a training
step is a pure function of (state, batch, step) — bitwise reproducible per
batch regardless of device count (BASELINE.json north star).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# Role indices for per-step key splitting. Per-batch (not per-device) draws
# match the reference semantics (deepv3.py:281-283 draws once per forward).
_ROLES = ("gates", "oc_resample", "np_l0", "np_l1", "dropout")


def step_keys(base_key: jax.Array, step: jax.Array | int) -> Dict[str, jax.Array]:
    """Derive the per-step keys for every random role from one base key."""
    k = jax.random.fold_in(base_key, jnp.asarray(step, jnp.uint32))
    keys = jax.random.split(k, len(_ROLES))
    return dict(zip(_ROLES, keys))

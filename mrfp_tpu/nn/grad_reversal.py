"""Gradient reversal (deepv3.py:128-149): identity forward, -alpha * grad
backward. Defined-but-unused in the reference forward; kept for capability
parity as a jax.custom_vjp."""

from __future__ import annotations

import jax


@jax.custom_vjp
def grad_reverse(x, alpha: float = 1.0):
    return x


def _fwd(x, alpha):
    return x, alpha


def _bwd(alpha, g):
    return (-alpha * g, None)


grad_reverse.defvjp(_fwd, _bwd)

"""Multi-host initialization.

Replaces the reference's hand-rolled NCCL rendezvous (main.py:42-52: WORLD_SIZE
env + a TCP port derived from wall-clock time, which breaks restarts). On TPU
pods jax.distributed discovers peers from the environment; a single call, and
every jit'd program spans all hosts' devices.
"""

from __future__ import annotations

import logging
from typing import Optional


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Idempotent jax.distributed.initialize; returns True if multi-process."""
    import jax

    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_count() > 1
    except (RuntimeError, ValueError) as e:
        # single-process (bench/dev) environments raise when no cluster env
        logging.info("single-process run (%s)", e)
        return False

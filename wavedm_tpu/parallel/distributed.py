"""Multi-host initialization.

Replaces the reference's process-per-GPU NCCL rendezvous
(torch.distributed.launch + env:// init, train_diffusion.py:34,62-66,80):
one process per HOST calls ``initialize_multihost`` and the global mesh spans
every chip; data pipelines shard by ``jax.process_index()`` and I/O gates on
``is_coordinator`` (the reference's rank-0 checks).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host.

    No-op for single-process runs (the common single-host case) and when
    already initialized.  Arguments default to the standard JAX env vars /
    cluster auto-detection.
    """
    already = getattr(jax._src.distributed.global_state, "client", None)
    if already is not None:
        return
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and num_processes is None:
        # single-host: nothing to do
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def is_coordinator() -> bool:
    """Process-0 gating (replaces the reference's dist.get_rank() == 0)."""
    return jax.process_index() == 0

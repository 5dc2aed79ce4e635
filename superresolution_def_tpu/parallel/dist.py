"""Multi-host runtime init — the `init_process_group` equivalent.

Single host (a full v5e-8 slice) needs nothing: the mesh covers all local
chips over ICI. Multi-host slices use `jax.distributed.initialize`, which
replaces the reference's env-var rendezvous on port 29500
(start_swin.py:131-141, train_swin.py:81-83) — coordination is by
coordinator address, and collectives ride ICI/DCN picked by XLA.
"""

from __future__ import annotations

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime when running multi-host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_master() -> bool:
    """Rank-0 discipline for filesystem writes (train_swin.py:116-119)."""
    return jax.process_index() == 0

"""Multi-host (multi-process) launch support.

The reference has no distributed layer at all (SURVEY.md §2.1).  On TPU pods
the runtime is ``jax.distributed.initialize`` + per-host input sharding: each
host reads a disjoint shard of the manifest (``host_shard``) and feeds its
local devices; gradient reduction rides ICI inside the jitted step via GSPMD.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX if configured; no-op for single host."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count())


def host_shard(n_items: int,
               process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> range:
    """The contiguous index range of the dataset this host owns."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (n_items + pc - 1) // pc
    start = pi * per
    return range(start, min(start + per, n_items))


def shard_list(items: Sequence, process_index=None, process_count=None):
    return [items[i] for i in host_shard(len(items), process_index,
                                         process_count)]

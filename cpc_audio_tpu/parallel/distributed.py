"""Multi-process (multi-host) initialization and per-host data sharding.

The reference is single-node (SURVEY.md §2.9: no torch.distributed
anywhere).  The TPU-native equivalent: ``jax.distributed.initialize`` wires
all hosts of a pod slice into one runtime, the global mesh spans every chip
(gradients psum over ICI within a slice and DCN across slices), and each
host's data loader reads only its shard of the file list.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, TypeVar

import jax

T = TypeVar("T")


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-process JAX runtime.

    On TPU pods with standard env vars, ``jax.distributed.initialize()``
    auto-detects everything; explicit args override.  Safe no-op when the
    runtime is already initialized or the run is single-process.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def process_info() -> Tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def shard_sequences(seq_names: Sequence[T],
                    process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> List[T]:
    """Each host loads only its strided shard of the file list.

    Deterministic given the input order; hosts see disjoint files, so the
    global batch (host shards x per-host sampling) covers the dataset."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return list(seq_names)
    return list(seq_names)[pi::pc]


def local_device_count() -> int:
    return jax.local_device_count()

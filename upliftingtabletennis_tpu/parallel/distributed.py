"""Multi-host (multi-process) initialization and rank-aware helpers.

TPU-native replacement for the reference's dormant NCCL/MPI/SLURM launchers
(ref: vit_pose/vit_utils/dist_util.py:47-118 `init_dist`, `get_dist_info`,
`master_only`): on TPU pods each host runs the same program,
`jax.distributed.initialize` wires the DCN control plane, and the ICI/DCN
device mesh plus jit partitioning replace torch.distributed collectives
(SURVEY §5.8).

Single-process use is a no-op throughout, so the same training scripts run
unchanged on one chip, one host with many chips, or a multi-host slice.
"""
from __future__ import annotations

import functools
import os
from typing import Callable, Optional, TypeVar

F = TypeVar("F", bound=Callable)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when running multi-process.

    Mirrors `init_dist`'s launcher auto-detection (ref: dist_util.py:47-66):
    explicit args win; otherwise standard cluster env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or a TPU pod
    environment which jax.distributed auto-detects). Returns True if the
    distributed runtime was initialized, False for single-process runs.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])

    in_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")) and bool(
        os.environ.get("TPU_WORKER_ID")
    )
    if coordinator_address is None and not in_tpu_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError:
        # already initialized
        return jax.process_count() > 1


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    """True on exactly one process — gate logging/checkpoint writes with it
    (the reference's `master_only`, ref: dist_util.py:121-138)."""
    return process_index() == 0


def main_process_only(fn: F) -> F:
    """Decorator: run `fn` on process 0 only (ref `master_only`)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None

    return wrapper


def local_batch_slice(global_batch: int) -> slice:
    """This process's shard of a globally-indexed batch — the
    DistributedSampler equivalent for host-local data loading
    (ref: train_valid_fn.py:48-68). Requires divisibility."""
    n, i = process_count(), process_index()
    assert global_batch % n == 0, f"batch {global_batch} not divisible by {n} processes"
    per = global_batch // n
    return slice(i * per, (i + 1) * per)

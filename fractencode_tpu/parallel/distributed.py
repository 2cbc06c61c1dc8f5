"""Multi-host runtime bring-up.

The reference is a single process (SURVEY.md section 5: no distributed
communication backend).  The TPU-native equivalent: ``jax.distributed``
initialization across hosts, with the failure surface the brief asks for —
fail loudly with enough context to act on, since the recovery story for a
deterministic pure encoder is simply "rerun the failed work".

Exercised for real by ``tests/test_distributed.py``: two localhost CPU
processes (Gloo collectives) run the full pod driver and must match a
single-process run bitwise.  The multi-chip *logic* is additionally covered
by the virtual-device mesh tests (tests/test_parallel.py) and the driver's
``dryrun_multichip``.
"""
from __future__ import annotations

import os

import jax

__all__ = ["initialize_multihost", "is_multihost", "host_local_batch"]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    initialization_timeout: float | None = None,
) -> dict:
    """Initialize the multi-host runtime. Returns a summary dict.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) or TPU-pod auto-detection when all
    are None.  ``initialization_timeout`` (seconds) bounds how long workers
    wait for the coordinator before failing loudly (default: JAX's 300 s).
    """
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"]
        )
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = initialization_timeout
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        raise RuntimeError(
            "multi-host initialization failed "
            f"(coordinator={kwargs.get('coordinator_address', 'auto')}, "
            f"pid={kwargs.get('process_id', 'auto')}): {e}. "
            "Each host must run the same program; check that the coordinator "
            "is reachable and every process uses a distinct process_id."
        ) from e
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )


def is_multihost() -> bool:
    return jax.process_count() > 1


def host_local_batch(global_batch: int) -> tuple[int, int]:
    """(per-host batch, offset of this host's slice) for even host splits."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    return per, per * jax.process_index()

"""Multi-host initialization helpers.

The reference is strictly single-process (SURVEY.md §2.4 — no NCCL/MPI/Gloo;
its only transport is cudaMemcpy). The TPU build scales across hosts with
JAX's native distributed runtime: every host runs the same SPMD program, XLA
routes collectives over ICI within a slice and DCN across slices — there is no
hand-written transport layer to maintain.

Typical pod usage:

    from cuda_gcn_tpu.parallel import multihost, sharded
    multihost.initialize()                  # no-op on single host
    mesh = sharded.make_mesh()              # all devices across all hosts
    cfg, inputs, truths = sharded.prepare_sharded(cfg, dataset, mesh)
    ...

Single-host multi-chip needs no initialization at all. This module is exercised
in CI only in its single-host no-op form; the mesh/sharding logic it feeds is
covered on the 8-device virtual mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process; returns True if
    initialization happened. Safe no-op for single-process runs (the common
    case on one host, and always in tests)."""
    import jax

    explicit = coordinator_address is not None
    env = any(k in os.environ for k in
              ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not env:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """True on the process that should own logging/checkpoint writes."""
    import jax

    return jax.process_index() == 0

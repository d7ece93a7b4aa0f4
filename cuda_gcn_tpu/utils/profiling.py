"""Profiling: jax.profiler trace capture + a speed-of-light model for the SpMM.

The reference's only profiling is wall-clock phase timers whose CUDA variants
measure kernel *launch*, not execution (SURVEY.md §5). Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of real device execution;
* ``spmm_speed_of_light`` — the measured roofline for this chip's aggregation:
  a random row gather pays ``max(row_bytes, GATHER_TRANSACTION_BYTES)`` of HBM
  traffic per edge, dense tiles stream at ``hbm_gbps``. Reports the fraction of
  that bound a measured pass achieves.
"""

from __future__ import annotations

import contextlib

# Empirical constants for the benchmark chip (see scripts/bench_ops.py history):
# random-row gathers move ~512B per row; streamed reads reach ~200 GB/s.
GATHER_TRANSACTION_BYTES = 512
DEFAULT_HBM_GBPS = 200.0


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def spmm_speed_of_light(nnz: int, dim: int, measured_s: float,
                        dense_tile_bytes: int = 0, residual_nnz: int | None = None,
                        itemsize: int = 4, hbm_gbps: float = DEFAULT_HBM_GBPS) -> dict:
    """Roofline fraction for one aggregation pass.

    nnz: total edges; residual_nnz: edges on the gather path (defaults to all);
    dense_tile_bytes: bytes of dense BSR tiles streamed per pass.
    """
    residual = nnz if residual_nnz is None else residual_nnz
    gather_bytes = residual * max(dim * itemsize, GATHER_TRANSACTION_BYTES)
    ideal_s = (gather_bytes + dense_tile_bytes) / (hbm_gbps * 1e9)
    return {
        "ideal_s": ideal_s,
        "measured_s": measured_s,
        "sol_fraction": ideal_s / measured_s if measured_s > 0 else 0.0,
        "gather_bytes": gather_bytes,
        "dense_tile_bytes": dense_tile_bytes,
    }

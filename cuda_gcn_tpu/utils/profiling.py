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


def populate_op_timers(graph, x, params, truth, key, *, dropout_rate: float = 0.5,
                       repeats: int | None = None) -> dict:
    """Measure real device time for every reference-timed op phase and record
    it in the global phase-timer registry (utils/timer.py).

    The reference brackets each module's forward/backward with TMR_* timers
    (src/common/timer.h:5-26, src/seq/module.cpp:12,21) — but its CUDA timings
    measure kernel LAUNCH, not execution (no sync, SURVEY.md §3.3). Here each
    op runs as a jitted K-repeat carry-chained lax.scan (the chain defeats
    hoisting/CSE) at the REAL model shapes, so per-op averages are true device
    times with dispatch amortized away. Returns {phase: avg_seconds}.
    """
    import time

    import jax
    import jax.numpy as jnp

    from cuda_gcn_tpu.models.gcn import _layer0_transform
    from cuda_gcn_tpu.ops.dropout import dropout
    from cuda_gcn_tpu.ops.graphsum import graphsum
    from cuda_gcn_tpu.ops.loss import masked_cross_entropy
    from cuda_gcn_tpu.ops.matmul import SparseFeatures
    from cuda_gcn_tpu.utils import timer as T

    n = graph.n_nodes
    if repeats is None:
        repeats = 50 if n < 50_000 else 10
    w1, w2 = params["w1"], params["w2"]
    sparse_x = isinstance(x, SparseFeatures)
    # the dropout'd tensor the reference's layer-0 Dropout touches: the dense
    # feature matrix, or the nnz VALUES of the sparse one (gcn.cpp:23)
    drop_target = x.values if sparse_x else x

    @jax.jit
    def _stage(x, graph, w1, w2):  # all operands as args (no constant capture)
        z1 = _layer0_transform(x, w1, 0.0, None, False)
        h1 = jnp.maximum(graphsum(z1, graph), 0.0)
        z2 = jnp.dot(h1, w2, preferred_element_type=jnp.float32).astype(z1.dtype)
        logits = graphsum(z2, graph)
        return z1, h1, z2, logits

    z1, h1, z2, logits = _stage(x, graph, w1, w2)
    g2 = jnp.ones_like(logits) / n
    g1 = jnp.ones_like(z1) / n

    def timed(fn, init, *args):
        # big operands (graph, x, weights, masks) travel as jit ARGUMENTS:
        # closing over them would bake them in as compile-time constants —
        # 3+ GB programs at reddit scale over the tunneled compiler
        # (CLAUDE.md; measured before this was argument-ized)
        @jax.jit
        def prog(h, *a):
            def body(c, i):
                out = fn(c, i, *a)
                # chain through one element so the op can't be hoisted/CSE'd
                return c + (0.0 * out.ravel()[0]).astype(c.dtype), None

            c, _ = jax.lax.scan(body, h, jnp.arange(repeats))
            return jnp.sum(c)

        float(prog(init, *args))  # compile + warm
        t0 = time.perf_counter()
        float(prog(init, *args))  # scalar materialization == reliable sync
        return (time.perf_counter() - t0) / repeats

    def _l0(xx, w):
        return _layer0_transform(xx, w, 0.0, None, False)

    def _l0_wgrad(c, xx, w):
        # layer-0 weight gradient (the reference's SparseMatmul backward,
        # module.cpp:63-77), derived inside the traced fn — no closures
        return jax.vjp(lambda ww: _l0(xx, ww), w)[1](c)[0]

    def _gs_bw(c, g):
        from cuda_gcn_tpu.ops.graphsum import _transpose_forward

        return _transpose_forward(c, g)

    # dropout backward is a mask multiply (the mask is saved from forward, not
    # re-sampled); time it with a pre-drawn inverted-dropout mask
    bw_mask = (jax.random.bernoulli(key, 1.0 - dropout_rate, drop_target.shape)
               .astype(drop_target.dtype) / (1.0 - dropout_rate))
    # TMR_LOSS_FW times loss AND gradient together on purpose: the reference's
    # CrossEntropyLoss computes the grad inside forward (module.cpp:145-158)
    # and its backward is a no-op
    ce_fwd = jax.value_and_grad(masked_cross_entropy)

    ops = {
        T.TMR_DROPOUT_FW: (lambda c, i: dropout(
            c, dropout_rate, jax.random.fold_in(key, i), True), drop_target),
        T.TMR_DROPOUT_BW: (lambda c, i, m: c * m, drop_target, bw_mask),
        T.TMR_SPMATMUL_FW: (lambda c, i, xx, w: _l0(xx, w + 0.0 * c.ravel()[0]),
                            jnp.zeros_like(w1), x, w1),
        T.TMR_SPMATMUL_BW: (lambda c, i, xx, w: _l0_wgrad(c, xx, w), g1, x, w1),
        T.TMR_GRAPHSUM_FW: (lambda c, i, g: graphsum(c, g), z1, graph),
        T.TMR_GRAPHSUM_BW: (lambda c, i, g: _gs_bw(c, g), g2, graph),
        T.TMR_RELU_FW: (lambda c, i: jnp.maximum(c, 0.0), z1),
        T.TMR_RELU_BW: (lambda c, i, hh: jnp.where(hh > 0, c, 0.0), g1, h1),
        T.TMR_MATMUL_FW: (lambda c, i, w: jnp.dot(
            c, w, preferred_element_type=jnp.float32), h1, w2),
        T.TMR_MATMUL_BW: (lambda c, i, hh, w: jnp.dot(
            c, w.T, preferred_element_type=jnp.float32)
            + 0.0 * jnp.dot(hh.T, c, preferred_element_type=jnp.float32).ravel()[0],
            g2, h1, w2),
        T.TMR_LOSS_FW: (lambda c, i, t: ce_fwd(c, t)[1], logits, truth),
    }
    out = {}
    for name, (fn, init, *args) in ops.items():
        avg = timed(fn, init, *args)
        T.timers.add(name, avg * repeats, repeats)
        out[name] = avg
    return out

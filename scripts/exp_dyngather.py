"""Microbenchmark Mosaic's tpu.dynamic_gather (the only legal VMEM gather).

Two supported forms (jax/_src/pallas/mosaic/lowering.py:2464-2524), both
requiring input.shape == indices.shape == output.shape on a 2D operand:

  [0] sublane gather: out[i, j] = table[idx[i, j], j]   (per-lane row select)
  [1] lane gather:    out[i, j] = table[i, idx[i, j]]   (per-sublane col select)

For graphsum, indices are broadcast (idx[i, j] = rows[i] resp cols[j]) so one
call gathers `rows` whole rows (form 0) or `cols` whole columns (form 1). The
question is elements/cycle; this decides the column-ELL kernel design.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(r)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) * 1000


def sublane_kernel(steps, idx_ref, tab_ref, out_ref):
    """out = sum_k take_along_axis(tab, idx_k, axis=0); idx [S,steps] compact."""
    import jax
    import jax.numpy as jnp

    tab = tab_ref[:]
    s, l = tab.shape

    def body(k, acc):
        idx = jnp.broadcast_to(idx_ref[:, k][:, None], (s, l))
        g = jnp.take_along_axis(tab, idx, axis=0)
        return acc + g.astype(jnp.float32)

    out_ref[:] = jax.lax.fori_loop(0, steps, body, jnp.zeros((s, l), jnp.float32))


def lane_kernel(steps, idx_ref, tab_ref, out_ref):
    """out = sum_k take_along_axis(tab, idx_k, axis=1); idx [steps,L] compact."""
    import jax
    import jax.numpy as jnp

    tab = tab_ref[:]
    s, l = tab.shape

    def body(k, acc):
        idx = jnp.broadcast_to(idx_ref[k, :][None, :], (s, l))
        g = jnp.take_along_axis(tab, idx, axis=1)
        return acc + g.astype(jnp.float32)

    out_ref[:] = jax.lax.fori_loop(0, steps, body, jnp.zeros((s, l), jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # --- form [0]: sublane (row) gather ---
    for s, l, dt, steps in ((8192, 128, jnp.float32, 64),
                            (8192, 128, jnp.bfloat16, 64),
                            (32768, 128, jnp.bfloat16, 64),
                            (1024, 128, jnp.float32, 64)):
        tab = jnp.asarray(rng.standard_normal((s, l)), dt)
        idx = jnp.asarray(rng.integers(0, s, size=(s, steps), dtype=np.int32))

        f = pl.pallas_call(
            functools.partial(sublane_kernel, steps),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, l), jnp.float32),
        )
        g = jax.jit(lambda i, t: jnp.sum(f(i, t)))
        try:
            ms = timeit(g, idx, tab, iters=args.iters)
            rows = s * steps
            print(f"[0] sublane-gather tab[{s}x{l}] {jnp.dtype(dt).name} x{steps} cols: "
                  f"{ms:8.2f} ms -> {ms * 1e6 / rows:.3f} ns/row "
                  f"({rows * l * jnp.dtype(dt).itemsize / ms / 1e6:.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"[0] tab[{s}x{l}] {jnp.dtype(dt).name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # --- form [1]: lane (column) gather ---
    for s, l, dt, steps in ((16, 8192, jnp.bfloat16, 64),
                            (16, 32768, jnp.bfloat16, 16),
                            (128, 8192, jnp.float32, 64)):
        tab = jnp.asarray(rng.standard_normal((s, l)), dt)
        idx = jnp.asarray(rng.integers(0, l, size=(steps, l), dtype=np.int32))

        f = pl.pallas_call(
            functools.partial(lane_kernel, steps),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, l), jnp.float32),
        )
        g = jax.jit(lambda i, t: jnp.sum(f(i, t)))
        try:
            ms = timeit(g, idx, tab, iters=args.iters)
            cols = l * steps
            print(f"[1] lane-gather tab[{s}x{l}] {jnp.dtype(dt).name} x{steps} rows: "
                  f"{ms:8.2f} ms -> {ms * 1e6 / cols:.3f} ns/col "
                  f"({cols * s * jnp.dtype(dt).itemsize / ms / 1e6:.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"[1] tab[{s}x{l}] {jnp.dtype(dt).name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

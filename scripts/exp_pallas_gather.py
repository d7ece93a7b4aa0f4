"""Pallas feasibility probes for a flat-piece streaming-residual kernel
(VERDICT round-2 directive #6).

The XLA flat-piece path costs ~10.7 ns/edge (gather ~4 + small segment_sum,
scripts/exp_flatpack.py). A Pallas kernel could in principle beat it by
fusing gather + scale + segment inside VMEM. Whether that wins hinges on two
Mosaic rates this script measures in isolation on the real chip:

  A. in-VMEM dynamic row gather (``jnp.take`` on a VMEM-resident table) —
     the round-1 finding (docs/PERF.md, scripts/exp_dyngather*.py) was that
     Mosaic cannot lower arbitrary-index gathers EXCEPT same-shape
     single-vreg operands; the existing ELL kernel (ops/pallas_spmm.py)
     nevertheless compiles a [TR*C]-row take — so measure what it costs.
  B. in-kernel sorted-segment accumulation: per-edge dynamic-index
     read-modify-write into a [rbw, d] VMEM accumulator (fori_loop).

Decision rule: a fused kernel is worth building iff A <= ~3 ns/row AND
B <= ~5 ns/edge (then piece cost ~window DMA 10us + cap*(A+B) beats the
XLA ~175 us/piece). Otherwise this closes the avenue with numbers.

Usage: python scripts/exp_pallas_gather.py [--rows 16384] [--m 1048576]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384, help="VMEM table rows")
    ap.add_argument("--m", type=int, default=1 << 20, help="gathered rows/edges")
    ap.add_argument("--d", type=int, default=128, help="feature width")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device={jax.devices()[0]} table=[{args.rows},{args.d}] m={args.m}",
          flush=True)
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (args.rows, args.d), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (args.m,), 0, args.rows,
                             dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)
    coef = jax.random.uniform(jax.random.PRNGKey(2), (args.m,), jnp.float32)

    CH = 512  # gather chunk

    # --- probe A: chunked in-VMEM jnp.take, reduce to keep output small ---
    def gather_kernel(idx_ref, h_ref, out_ref):
        hh = h_ref[:]

        def body(i, acc):
            ids = idx_ref[pl.ds(i * CH, CH)]
            g = jnp.take(hh, ids, axis=0)          # [CH, d] VMEM row gather
            return acc + jnp.sum(g, axis=0)

        acc = jax.lax.fori_loop(0, args.m // CH, body,
                                jnp.zeros((args.d,), jnp.float32))
        out_ref[0, :] = acc

    @jax.jit
    def probe_a(idx, h):
        return pl.pallas_call(
            gather_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, args.d), jnp.float32),
        )(idx, h).sum()

    # --- probe B: per-edge dynamic-index accumulate into [rows, d] VMEM ---
    mb = min(args.m, 1 << 16)  # scalar loop: bound trip count

    def scatter_kernel(idx_ref, coef_ref, h_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        hh = h_ref[:]

        def body(i, _):
            r = idx_ref[i]
            g = jnp.take(hh, jnp.full((1,), i % args.rows, jnp.int32), axis=0)
            out_ref[pl.ds(r, 1), :] += coef_ref[i] * g
            return 0

        jax.lax.fori_loop(0, mb, body, 0)

    @jax.jit
    def probe_b(idx, coef, h):
        return pl.pallas_call(
            scatter_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((args.rows, args.d), jnp.float32),
        )(idx, coef, h).sum()

    # --- reference: XLA windowed gather+segment at the same shapes ---
    @jax.jit
    def xla_ref(idx, coef, h):
        vals = h[idx] * coef[:, None]
        return jax.ops.segment_sum(vals, idx, num_segments=args.rows,
                                   indices_are_sorted=True).sum()

    for name, fn, fa, mm in (
            ("A pallas VMEM take", probe_a, (idx, h), args.m),
            ("B pallas scatter+=", probe_b, (idx_sorted, coef, h), mb),
            ("XLA gather+segsum", xla_ref, (idx_sorted, coef, h), args.m)):
        try:
            t0 = time.perf_counter()
            float(fn(*fa))
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(fn(*fa))
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            print(f"{name}: compile {compile_s:.1f}s, warm {best * 1e3:.1f} ms"
                  f" = {best / mm * 1e9:.2f} ns/row", flush=True)
        except Exception as e:  # noqa: BLE001 — record lowering failures
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()

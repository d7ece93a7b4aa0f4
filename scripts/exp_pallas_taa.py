"""Pallas TAA-formulation probes for the flat-piece residual kernel
(round 3, VERDICT round-2 directive #6).

Round-1 finding (scripts/exp_dyngather3.py): Mosaic lowers jnp.take_along_axis
ONLY for same-shape operands — out[i, j] = tab[idx[i, j], j]. That is enough
to express BOTH halves of the piece aggregation without arbitrary gathers:

  * row gather: idx[i, :] = broadcast(col_id_i) -> out[i, :] = tab[col_id_i, :]
  * sorted segment-sum: S = cumsum(vals, axis=0); out[r] = S[end_r] - S[begin_r]
    where end/begin are per-segment boundary positions — again TAA with
    broadcast indices.

This measures, in-kernel on the real chip:
  A2  TAA row-gather rate at [S, 128] (table = S rows resident in VMEM)
  C   cumsum(vals, axis=0) rate at [S, 128]
  D   full piece pipeline: gather + scale + cumsum + boundary-diff
      vs the XLA gather+segment_sum at identical shapes

Usage: python scripts/exp_pallas_taa.py [--s 16384]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=16384, help="rows per TAA call")
    ap.add_argument("--reps", type=int, default=16, help="in-kernel repeats")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, reps = args.s, args.reps
    print(f"device={jax.devices()[0]} S={s} reps={reps}", flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((s, 128)), jnp.float32)
    ids = jnp.asarray(np.sort(rng.integers(0, s, s)).astype(np.int32)[:, None])
    coef = jnp.asarray(rng.random((s, 1), dtype=np.float32))
    # segment boundaries for a [s]-row output: rows sorted; begin/end positions
    rows_sorted = np.sort(rng.integers(0, s, s)).astype(np.int32)
    begin = np.searchsorted(rows_sorted, np.arange(s)).astype(np.int32)
    end = np.searchsorted(rows_sorted, np.arange(s), side="right").astype(np.int32)
    begin_j = jnp.asarray(begin[:, None])
    end_j = jnp.asarray(end[:, None])
    rows_j = jnp.asarray(rows_sorted)

    def run(name, fn, fa, work_rows):
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
            print(f"{name}: compile {compile_s:.1f}s, warm {best * 1e3:.2f} ms"
                  f" = {best / work_rows * 1e9:.3f} ns/row", flush=True)
        except Exception as e:  # noqa: BLE001 — record lowering failures
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:240]}",
                  flush=True)

    # --- A2: TAA row gather, idx lane-broadcast in kernel ---
    def taa_kernel(ids_ref, tab_ref, out_ref):
        tabv = tab_ref[:]
        idx = jnp.broadcast_to(ids_ref[:], (s, 128))

        def body(_, acc):
            return acc + jnp.take_along_axis(tabv, idx, axis=0)

        out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                       jnp.zeros((s, 128), jnp.float32))

    @jax.jit
    def probe_a2(ids, tab):
        return pl.pallas_call(
            taa_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
        )(ids, tab).sum()

    # --- C: cumsum along sublanes ---
    def cumsum_kernel(tab_ref, out_ref):
        tabv = tab_ref[:]

        def body(i, acc):
            return acc + jnp.cumsum(tabv + acc * 0, axis=0)

        out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                       jnp.zeros((s, 128), jnp.float32))

    @jax.jit
    def probe_c(tab):
        return pl.pallas_call(
            cumsum_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
        )(tab).sum()

    # --- D: full piece = gather + scale + cumsum + boundary diff ---
    def piece_kernel(ids_ref, coef_ref, b_ref, e_ref, tab_ref, out_ref):
        tabv = tab_ref[:]
        idx = jnp.broadcast_to(ids_ref[:], (s, 128))
        bidx = jnp.broadcast_to(b_ref[:], (s, 128))
        eidx = jnp.broadcast_to(e_ref[:], (s, 128))
        cf = coef_ref[:]

        def body(_, acc):
            vals = jnp.take_along_axis(tabv, idx, axis=0) * cf
            cs = jnp.cumsum(vals, axis=0)
            # segment r sums rows [begin_r, end_r): cs[end-1] - cs[begin-1]
            zrow = jnp.zeros((1, 128), jnp.float32)
            csz = jnp.concatenate([zrow, cs], axis=0)[:s + 1]
            hi = jnp.take_along_axis(csz, eidx, axis=0)
            lo = jnp.take_along_axis(csz, bidx, axis=0)
            return acc + (hi - lo)

        out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                       jnp.zeros((s, 128), jnp.float32))

    @jax.jit
    def probe_d(ids, coef, b, e, tab):
        return pl.pallas_call(
            piece_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
        )(ids, coef, b, e, tab).sum()

    # --- XLA reference at the same shapes ---
    @jax.jit
    def xla_ref(ids, coef, tab):
        vals = tab[ids[:, 0]] * coef
        return jax.ops.segment_sum(vals, rows_j, num_segments=s,
                                   indices_are_sorted=True).sum()

    run("A2 TAA row-gather ", probe_a2, (ids, tab), s * reps)
    run("C  cumsum axis0   ", probe_c, (tab,), s * reps)
    run("D  full piece TAA ", probe_d, (ids, coef, begin_j, end_j, tab), s * reps)
    run("X  XLA gather+seg ", xla_ref, (ids, coef, tab), s)

    # correctness spot-check of D's math (single rep, numpy)
    vals = np.asarray(tab)[np.asarray(ids)[:, 0]] * np.asarray(coef)
    cs = np.concatenate([np.zeros((1, 128)), np.cumsum(vals, 0)])
    want = (cs[end] - cs[begin]).sum()
    got = float(probe_d(ids, coef, begin_j, end_j, tab)) / reps
    print(f"D correctness: got {got:.1f} want {want:.1f} "
          f"({'OK' if abs(got - want) < abs(want) * 1e-3 + 1 else 'MISMATCH'})",
          flush=True)


if __name__ == "__main__":
    main()

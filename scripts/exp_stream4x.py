"""Streaming-residual experiment for the synth-reddit4x cliff (docs/PERF.md
"Beyond reddit"): at ~73M residual edges the gather+segment_sum pipeline
degrades to 75-176 ns/edge (vs 11.5 at reddit scale), scaling with feature
width — the round-1 verdict's #1 item.

Hypothesis: the degradation tracks the SEGMENT OUTPUT SIZE (932K rows), not
the edge count — per-edge cost at 4x is ~4.5 ns per edge*feature-element in
both layouts, i.e. the reduction scalarizes. If true, bounding each
reduction's output to a small row window (dynamic-sliced accumulator) should
restore the fast regime, and column windows then buy the 3x gather-locality
factor on top.

The residual at this scale is near-uniform background (docs/PERF.md
"ordering"), so the proxy workload is synthesized ON DEVICE (no multi-GB H2D
over the ~30 MB/s tunnel): n=933,888 nodes, uniform degree 78 (m=72.8M),
random columns, random coefficients.

Variants, each one full aggregation pass out[n, d] = sum over edges:
  A  flat sorted segment_sum (current 'segment'/blocked regime at 4x)
  C  row-banded: scan over 57 bands of 16K rows; per band gather from the
     FULL table, segment_sum into [16K+1, d], accumulate via dynamic slices
  D  2D-tiled: 57x57 (row-band x col-window) tiles, cap edges each; gathers
     hit a dynamic-sliced 16K-row table window (the 4 ns/row path)
  Dn nested variant of D: outer scan over bands, inner over col windows,
     accumulator window carried across the inner scan (1 acc write per band)

Usage: python scripts/exp_stream4x.py [--iters 3] [--dims 16,41] [--skip A]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

RBW = 16384          # row-band width (accumulator window rows)
NBANDS = 57          # 57 * 16384 = 933,888 nodes ~ synth-reddit4x
DEG = 78             # uniform degree -> 72.8M edges ~ the 73M 4x residual
NCOLS = 57           # column windows per band (window = 16384 table rows)
CAP = 22528          # edges per 2D tile (57*57*22528 = 73.2M)


def set_globals(args):
    global RBW, NBANDS, DEG, NCOLS, CAP
    RBW, NBANDS, DEG, NCOLS, CAP = (args.rbw, args.nbands, args.deg,
                                    args.ncols, args.cap)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dims", default="16,41")
    ap.add_argument("--skip", default="", help="comma-separated variant names")
    ap.add_argument("--rbw", type=int, default=RBW)
    ap.add_argument("--nbands", type=int, default=NBANDS)
    ap.add_argument("--deg", type=int, default=DEG)
    ap.add_argument("--ncols", type=int, default=NCOLS)
    ap.add_argument("--cap", type=int, default=CAP)
    args = ap.parse_args()
    set_globals(args)
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp

    n = RBW * NBANDS
    m_flat = n * DEG
    m_tiled = NBANDS * NCOLS * CAP
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    print(f"device={jax.devices()[0]} n={n} m_flat={m_flat} m_tiled={m_tiled}",
          flush=True)

    # --- device-side workload synthesis (no host transfer) ---
    @jax.jit
    def make_flat():
        rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), DEG)
        cols = jax.random.randint(k1, (m_flat,), 0, n, dtype=jnp.int32)
        coef = jax.random.uniform(k2, (m_flat,), jnp.float32)
        return rows, cols, coef

    @jax.jit
    def make_banded():
        # per band: same local row pattern (cost-identical to varying rows),
        # fresh random cols/coefs
        rows_l = jnp.repeat(jnp.arange(RBW, dtype=jnp.int32), DEG)
        cols = jax.random.randint(k3, (NBANDS, RBW * DEG), 0, n, dtype=jnp.int32)
        coef = jax.random.uniform(k4, (NBANDS, RBW * DEG), jnp.float32)
        return rows_l, cols, coef

    @jax.jit
    def make_tiled():
        t = NBANDS * NCOLS
        rows_l = jnp.sort(
            jax.random.randint(k5, (t, CAP), 0, RBW, dtype=jnp.int32), axis=1)
        cols_l = jax.random.randint(k6, (t, CAP), 0, RBW, dtype=jnp.int32)
        coef = jax.random.uniform(k2, (t, CAP), jnp.float32)
        rstart = (jnp.arange(t, dtype=jnp.int32) // NCOLS) * RBW
        cstart = (jnp.arange(t, dtype=jnp.int32) % NCOLS) * RBW
        return rows_l, cols_l, coef, rstart, cstart

    # --- variants ---
    def flat_pass(h, rows, cols, coef):
        vals = h[cols] * coef[:, None]
        out = jax.ops.segment_sum(vals.astype(jnp.float32), rows, num_segments=n,
                                  indices_are_sorted=True)
        return jnp.sum(jnp.square(out))

    def banded_pass(h, rows_l, cols, coef):
        def step(acc, xs):
            b, c, w = xs
            vals = h[c] * w[:, None]
            part = jax.ops.segment_sum(vals.astype(jnp.float32), rows_l,
                                       num_segments=RBW + 1,
                                       indices_are_sorted=True)
            win = jax.lax.dynamic_slice_in_dim(acc, b * RBW, RBW)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, win + part[:RBW], b * RBW, 0), None

        acc0 = jnp.zeros((n, h.shape[1]), jnp.float32)
        acc, _ = jax.lax.scan(
            step, acc0, (jnp.arange(NBANDS, dtype=jnp.int32), cols, coef))
        return jnp.sum(jnp.square(acc))

    def tiled_pass(h, rows_l, cols_l, coef, rstart, cstart):
        def step(acc, xs):
            r0, c0, r, c, w = xs
            sub = jax.lax.dynamic_slice_in_dim(h, c0, RBW)
            vals = sub[c] * w[:, None]
            part = jax.ops.segment_sum(vals.astype(jnp.float32), r,
                                       num_segments=RBW + 1,
                                       indices_are_sorted=True)
            win = jax.lax.dynamic_slice_in_dim(acc, r0, RBW)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, win + part[:RBW], r0, 0), None

        acc0 = jnp.zeros((n, h.shape[1]), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0, (rstart, cstart, rows_l, cols_l, coef))
        return jnp.sum(jnp.square(acc))

    def nested_pass(h, rows_l, cols_l, coef, rstart, cstart):
        t = NBANDS * NCOLS
        r4 = rows_l.reshape(NBANDS, NCOLS, CAP)
        c4 = cols_l.reshape(NBANDS, NCOLS, CAP)
        w4 = coef.reshape(NBANDS, NCOLS, CAP)
        cst = cstart.reshape(NBANDS, NCOLS)

        def band(acc, xs):
            b, rr, cc, ww, cs = xs

            def col(win, ys):
                c0, r, c, w = ys
                sub = jax.lax.dynamic_slice_in_dim(h, c0, RBW)
                vals = sub[c] * w[:, None]
                part = jax.ops.segment_sum(vals.astype(jnp.float32), r,
                                           num_segments=RBW + 1,
                                           indices_are_sorted=True)
                return win + part[:RBW], None

            win0 = jax.lax.dynamic_slice_in_dim(acc, b * RBW, RBW)
            win, _ = jax.lax.scan(col, win0, (cs, rr, cc, ww))
            return jax.lax.dynamic_update_slice_in_dim(acc, win, b * RBW, 0), None

        acc0 = jnp.zeros((n, h.shape[1]), jnp.float32)
        acc, _ = jax.lax.scan(
            band, acc0,
            (jnp.arange(NBANDS, dtype=jnp.int32), r4, c4, w4, cst))
        return jnp.sum(jnp.square(acc))

    t0 = time.perf_counter()
    flat = jax.block_until_ready(make_flat())
    banded = jax.block_until_ready(make_banded())
    tiled = jax.block_until_ready(make_tiled())
    print(f"synthesis: {time.perf_counter() - t0:.1f}s", flush=True)

    fns = {
        "A": (jax.jit(flat_pass), flat, m_flat),
        "C": (jax.jit(banded_pass), banded, m_flat),
        "D": (jax.jit(tiled_pass), tiled, m_tiled),
        "Dn": (jax.jit(nested_pass), tiled, m_tiled),
    }
    for d in (int(s) for s in args.dims.split(",")):
        h = jax.random.normal(jax.random.PRNGKey(7), (n, d), jnp.float32)
        for name, (fn, data, m) in fns.items():
            if name in skip or (name == "A" and d > 16):
                print(f"{name} d={d}: skipped", flush=True)
                continue
            try:
                t0 = time.perf_counter()
                float(fn(h, *data))
                compile_s = time.perf_counter() - t0
                times = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    float(fn(h, *data))
                    times.append(time.perf_counter() - t0)
                best = min(times)
                print(f"{name} d={d}: compile+1st {compile_s:.1f}s, warm "
                      f"{best * 1000:.0f} ms = {best / m * 1e9:.2f} ns/edge",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — report OOMs and keep going
                print(f"{name} d={d}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()

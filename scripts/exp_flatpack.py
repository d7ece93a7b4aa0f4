"""Flat bucketed piece-list residual: chip measurement (round-3 directive #1).

The round-2 [band, col, cap] rectangle measured ~2.2x padded slots and
~47 ns/real-edge on the skewed 8x-reddit residual (docs/PERF.md §8x) because
its cap/nc were global maxima. This experiment measures the flat bucketed
replacement (data/graph.py Blocked2DDev) on both residual regimes:

* uniform4x — n=933,888, uniform degree 78 (72.8M edges, random cols): the
  4x residual character; round-2 nested rectangle measured 10.2 ns/edge here
  (scripts/exp_stream4x.py variant Dn).
* skew8x — n=1,863,680 with hub rows/cols (~20% of edges in 50 hubs) and a
  low-density tail spanning the last quarter of the node range: the 8x skew
  character that broke the rectangle.

Both apply formulations are measured: 'carry' (band window carried in the
scan, lax.cond flush on band change) and 'rmw' (unconditional window
read-modify-write per piece). Usage:

    python scripts/exp_flatpack.py [--profile uniform4x,skew8x] [--dims 16,41]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_uniform4x(rng, scale=1.0):
    n = int(933_888 * scale)
    deg = 78
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rng.integers(0, n, n * deg).astype(np.int64)
    coef = rng.random(n * deg, dtype=np.float32)
    return rows, cols, coef, n


def make_skew8x(rng, scale=1.0):
    n = int(1_863_680 * scale)
    m = int(70_000_000 * scale)
    hub = m // 5
    tail = m // 16
    body = m - hub - tail
    rows = np.concatenate([
        rng.integers(0, 50, hub),
        rng.integers(0, 3 * n // 4, body),
        rng.integers(3 * n // 4, n, tail),
    ]).astype(np.int64)
    rows.sort()
    cols = np.concatenate([
        rng.integers(0, 50, hub),
        rng.integers(0, n, m - hub),
    ])
    cols = cols[rng.permutation(m)].astype(np.int64)
    coef = rng.random(m, dtype=np.float32)
    return rows, cols, coef, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="uniform4x,skew8x")
    ap.add_argument("--dims", default="16,41")
    ap.add_argument("--impls", default="carry,rmw")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import cuda_gcn_tpu.ops.graphsum as _  # noqa: F401 (module import below)
    import importlib

    gs = importlib.import_module("cuda_gcn_tpu.ops.graphsum")
    from cuda_gcn_tpu.data.graph import _blocked2d_pack, blocked2d_stats

    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    makers = {"uniform4x": make_uniform4x, "skew8x": make_skew8x}

    for prof in args.profile.split(","):
        rows, cols, coef, n = makers[prof](rng, args.scale)
        m = len(rows)
        t0 = time.perf_counter()
        b2 = _blocked2d_pack(rows, cols, coef, n)
        pack_s = time.perf_counter() - t0
        stats = blocked2d_stats(b2)
        print(f"[{prof}] n={n} m={m} pack={pack_s:.1f}s "
              f"pieces={stats['pieces']} pad_ratio={stats['pad_ratio']} "
              f"rbw={stats['rbw']} width={stats['width']} "
              f"buckets={[(b['cap'], b['pieces']) for b in stats['buckets']]}",
              flush=True)
        t0 = time.perf_counter()
        b2 = jax.block_until_ready(jax.device_put(b2))
        print(f"[{prof}] H2D {time.perf_counter() - t0:.1f}s", flush=True)

        for d in (int(s) for s in args.dims.split(",")):
            h = jax.block_until_ready(
                jax.random.normal(jax.random.PRNGKey(7), (n, d), jnp.float32))
            for impl in args.impls.split(","):
                gs._BLOCKED2D_IMPL = impl

                @jax.jit
                def one_pass(h, b2):
                    return jnp.sum(jnp.square(gs._blocked2d_apply(h, b2, n)))

                try:
                    t0 = time.perf_counter()
                    float(one_pass(h, b2))
                    compile_s = time.perf_counter() - t0
                    times = []
                    for _ in range(args.iters):
                        t0 = time.perf_counter()
                        float(one_pass(h, b2))
                        times.append(time.perf_counter() - t0)
                    best = min(times)
                    print(f"[{prof}] impl={impl} d={d}: compile+1st "
                          f"{compile_s:.1f}s, warm {best * 1000:.0f} ms = "
                          f"{best / m * 1e9:.2f} ns/real-edge", flush=True)
                except Exception as e:  # noqa: BLE001 — report OOM, keep going
                    print(f"[{prof}] impl={impl} d={d}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        del b2


if __name__ == "__main__":
    main()

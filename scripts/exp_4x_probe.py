"""Probe the synth-reddit4x cost regime: host-side build phases + device
per-pass graphsum times. The static cost model predicted ~1.7 s/epoch but a
full epoch measured ~41 s — this separates host build, compile, and per-pass
device time to find the 10x.

Usage: python scripts/exp_4x_probe.py [--iters 2]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--dataset", default="reddit4x")
    ap.add_argument("--skip-trainstep", action="store_true")
    ap.add_argument("--no-blocked", action="store_true",
                    help="disable the column-blocked residual (flat sorted-segment path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import load_bench_dataset, maybe_reorder_cached
    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu.data.graph import build_graph
    from cuda_gcn_tpu.ops.graphsum import graphsum, _transpose_forward

    t0 = time.perf_counter()
    ds, name = load_bench_dataset(args.dataset, "data")
    print(f"load: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    ds = maybe_reorder_cached(ds, name)
    print(f"reorder: {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = ds.apply_config(GCNConfig())
    n, hd, c = cfg.num_nodes, cfg.hidden_dim, cfg.output_dim
    print(f"{name}: n={n} nnz={ds.graph.nnz} device={jax.devices()[0]}", flush=True)

    t0 = time.perf_counter()
    bkw = dict(blocked_min_nodes=1 << 62) if args.no_blocked else {}
    # declare the dense feature matrix to the tile-budget model, like
    # train.prepare does — otherwise tiles overcommit the HBM the features need
    feat_bytes = n * (-(-cfg.input_dim // 128) * 128) * 4
    g = build_graph(ds.graph, backend="bsr", aux_bytes=feat_bytes, **bkw)
    print(f"build_graph(bsr){' flat-resid' if args.no_blocked else ''}: "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    k = int(g.bsr_tiles.shape[0])
    tile_gb = k * g.bsr_tb * g.bsr_tb * jnp.dtype(g.bsr_tiles.dtype).itemsize / 1e9
    print(f"tiles={k} tb={g.bsr_tb} ({tile_gb:.2f} GB {g.bsr_tiles.dtype}) "
          f"residual_nnz={g.nnz}", flush=True)

    key = jax.random.PRNGKey(1)
    # pass the graph as an ARGUMENT: closing over it captures its arrays as
    # multi-GB compile-time constants (jax warns at 7.17 GB here)
    gs = jax.jit(lambda hh, gg: jnp.sum(jnp.square(graphsum(hh, gg))))
    gst = jax.jit(lambda hh, gg: jnp.sum(jnp.square(_transpose_forward(hh, gg))))

    for d in (hd, c):
        h = jax.random.normal(key, (n, d), jnp.float32)
        for label, fn in (("fwd", gs), ("transpose", gst)):
            t0 = time.perf_counter()
            r = float(fn(h, g))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(fn(h, g))
                times.append(time.perf_counter() - t0)
            print(f"graphsum d={d} {label}: compile+1st {compile_s:.2f}s, "
                  f"warm {min(times) * 1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

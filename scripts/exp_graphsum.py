"""Graphsum backend experiments on the live chip (reddit profile).

Measures one aggregation pass (fwd and transpose) for:
  * pallas ELL kernel with H pinned in VMEM (the 12 ns/row HBM-gather killer)
  * BSR variants: tile size x dtype x min-edge threshold, LPA-reordered
  * the segment baseline

Per calibration (scripts/chip_calibrate.py on TPU v5 lite):
  HBM random row gather ~12.3 ns/row (width-independent, latency-bound)
  sorted segment_sum    ~11.2 ns/row
  MXU                   ~32 TFLOP/s
  dispatch overhead     ~29 ms (subtract from everything)
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

DISPATCH_MS = 0.0  # printed raw; subtract mentally


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--which", default="bsr,segment")
    ap.add_argument("--tiles", default="128,256,512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import load_bench_dataset
    from cuda_gcn_tpu.data.graph import build_graph
    from cuda_gcn_tpu.data.reorder import locality_permutation, reorder_dataset
    from cuda_gcn_tpu.ops.graphsum import graphsum, _transpose_forward

    which = args.which.split(",")
    ds, name = load_bench_dataset(args.dataset, "data")
    n = ds.num_nodes
    print(f"{name}: n={n} nnz={ds.graph.nnz} device={jax.devices()[0]}", flush=True)

    print("computing LPA locality permutation...", flush=True)
    t0 = time.perf_counter()
    perm = locality_permutation(ds.graph)
    ds_r = reorder_dataset(ds, perm).dataset
    print(f"  reorder in {time.perf_counter() - t0:.1f}s", flush=True)

    key = jax.random.PRNGKey(1)
    h16 = jax.random.normal(key, (n, 16), jnp.float32)
    h41 = jax.random.normal(key, (n, 41), jnp.float32)

    gs = jax.jit(lambda hh, gg: jnp.sum(jnp.square(graphsum(hh, gg))))
    gst = jax.jit(lambda hh, gg: jnp.sum(jnp.square(_transpose_forward(hh, gg))))

    def run(tag, g):
        for h, d in ((h16, 16), (h41, 41)):
            try:
                f = timeit(gs, h, g, iters=args.iters)
                t = timeit(gst, h, g, iters=args.iters)
                print(f"  {tag} d={d}: fwd {f:8.2f} ms  transpose {t:8.2f} ms", flush=True)
            except Exception as e:
                print(f"  {tag} d={d}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
                break

    if "segment" in which:
        print("-- segment (reordered)", flush=True)
        run("segment", build_graph(ds_r.graph, backend="segment"))

    if "pallas" in which:
        print("-- pallas ELL, H in VMEM", flush=True)
        run("pallas", build_graph(ds_r.graph, backend="pallas"))

    if "bsr" in which:
        for tb in (int(t) for t in args.tiles.split(",")):
            for tiles_dt in ("float32", "bfloat16"):
                itemsize = 4 if tiles_dt == "float32" else 2
                # break-even: tile stream bytes / (12.3 ns * BW) edges; assume
                # 400 GB/s stream -> bytes/0.0123us/400e9... simpler: calibrate
                # min_edges = tile_bytes / 410  (410 B = 12.3ns * 400GB/s... )
                min_edges = max(tb * tb * itemsize // 410, 16)
                g = build_graph(ds_r.graph, backend="bsr", bsr_tile=tb,
                                bsr_min_edges=min_edges)
                if tiles_dt == "bfloat16" and g.bsr_tiles is not None:
                    g = dataclasses.replace(g, bsr_tiles=g.bsr_tiles.astype(jnp.bfloat16))
                k = int(g.bsr_tiles.shape[0]) if g.bsr_tiles is not None else 0
                tile_gb = k * tb * tb * itemsize / 1e9
                covered = ds_r.graph.nnz - g.nnz
                print(f"-- bsr tb={tb} {tiles_dt} min_edges={min_edges}: tiles={k} "
                      f"({tile_gb:.2f} GB) covered={covered / ds_r.graph.nnz * 100:.1f}% "
                      f"residual={g.nnz / 1e6:.1f}M", flush=True)
                if k == 0:
                    continue
                run(f"bsr{tb}/{tiles_dt[:4]}", g)


if __name__ == "__main__":
    main()

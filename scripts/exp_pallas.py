"""Measure Pallas VMEM gather throughput and the pallas-ELL graphsum at reddit
scale with bf16 activations (h [233K,16] bf16 = 60 MB -> fits v5e VMEM).

If VMEM row gathers run at ~1-3 ns/row (vs 12.3 ns from HBM, see
chip_calibrate), the whole-graph ELL kernel beats the BSR hybrid outright.
"""

from __future__ import annotations

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--which", default="micro,graphsum")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"device={jax.devices()[0]}", flush=True)
    which = args.which.split(",")

    if "micro" in which:
        # raw VMEM gather microbenchmark via the bucket kernel: one fat bucket
        from cuda_gcn_tpu.ops.pallas_spmm import _bucket_spmm

        rng = np.random.default_rng(0)
        m = 1 << 22  # 4M gathers
        w = 64
        r = m // w
        for n_rows, d, dt in ((1 << 18, 16, jnp.bfloat16), (1 << 18, 16, jnp.float32),
                              (1 << 18, 41, jnp.bfloat16), (1 << 15, 16, jnp.float32)):
            pad_d = -(-d // 128) * 128
            vmem_mb = n_rows * pad_d * jnp.dtype(dt).itemsize / 1e6
            if vmem_mb > 110:
                print(f"skip [{n_rows}x{d}] {dt.__name__}: {vmem_mb:.0f} MB > VMEM", flush=True)
                continue
            tab = jnp.asarray(rng.standard_normal((n_rows, d)), dt)
            cols = jnp.asarray(rng.integers(0, n_rows, size=(r, w), dtype=np.int32))
            coef = jnp.asarray(rng.standard_normal((r, w)), jnp.float32)
            f = jax.jit(lambda c, co, t: jnp.sum(
                _bucket_spmm(c, co, t, interpret=False).astype(jnp.float32)))
            try:
                ms = timeit(f, cols, coef, tab, iters=args.iters)
                print(f"pallas gather {m / 1e6:.0f}M from [{n_rows}x{d}] {jnp.dtype(dt).name} "
                      f"({vmem_mb:.0f} MB VMEM): {ms:8.2f} ms -> {ms * 1e6 / m:.2f} ns/row",
                      flush=True)
            except Exception as e:
                print(f"pallas gather [{n_rows}x{d}] {jnp.dtype(dt).name} FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)

    if "graphsum" in which:
        from bench import load_bench_dataset
        from cuda_gcn_tpu.data.graph import build_graph
        from cuda_gcn_tpu.ops.graphsum import graphsum, _transpose_forward

        ds, name = load_bench_dataset(args.dataset, "data")
        n = ds.num_nodes
        print(f"{name}: n={n} nnz={ds.graph.nnz}", flush=True)
        g = build_graph(ds.graph, backend="pallas")
        key = jax.random.PRNGKey(1)
        gs = jax.jit(lambda hh, gg: jnp.sum(jnp.square(graphsum(hh, gg)).astype(jnp.float32)))
        gst = jax.jit(lambda hh, gg: jnp.sum(jnp.square(_transpose_forward(hh, gg)).astype(jnp.float32)))
        for d in (16, 41):
            for dt in (jnp.bfloat16, jnp.float32):
                h = jax.random.normal(key, (n, d), dt)
                pad_d = -(-d // 128) * 128
                vmem_mb = n * pad_d * jnp.dtype(dt).itemsize / 1e6
                tag = f"pallas-ell d={d} {jnp.dtype(dt).name} (h={vmem_mb:.0f}MB)"
                try:
                    f = timeit(gs, h, g, iters=args.iters)
                    t = timeit(gst, h, g, iters=args.iters)
                    print(f"  {tag}: fwd {f:8.2f} ms  transpose {t:8.2f} ms", flush=True)
                except Exception as e:
                    print(f"  {tag}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

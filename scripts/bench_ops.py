"""Op-level microbenchmarks on the live device: graphsum backends, matmuls,
full forward/backward — prints ms per op. Timing materializes results via
np.asarray (block_until_ready is unreliable over the axon tunnel).

Usage: python scripts/bench_ops.py [--dataset reddit] [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, iters=5, warmup=2):
    for _ in range(warmup):
        r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])  # forces full materialization
        times.append(time.perf_counter() - t0)
    return min(times) * 1000  # ms


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ops", default="all", help="comma list: ell,segment,pallas,matmul,fwd,bwd")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import load_bench_dataset
    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu.data.graph import build_graph
    from cuda_gcn_tpu.models import gcn
    from cuda_gcn_tpu.ops.graphsum import graphsum

    ops = args.ops.split(",") if args.ops != "all" else ["ell", "segment", "matmul", "fwd", "bwd"]

    ds, name = load_bench_dataset(args.dataset, "data")
    cfg = ds.apply_config(GCNConfig(compute_dtype=args.dtype))
    dt = jnp.dtype(args.dtype)
    x = jnp.asarray(ds.dense_features(np.dtype(args.dtype)))
    params = gcn.init_params(jax.random.PRNGKey(0), cfg.layer_dims(), dtype=dt)
    n, f, h_dim, c = cfg.num_nodes, cfg.input_dim, cfg.hidden_dim, cfg.output_dim
    print(f"{name}: n={n} nnz={ds.graph.nnz} f={f} h={h_dim} c={c} dtype={dt}", file=sys.stderr)

    key = jax.random.PRNGKey(1)
    h16 = jax.random.normal(key, (n, h_dim), dt)
    h41 = jax.random.normal(key, (n, c), dt)

    for backend in ["ell", "segment", "pallas"]:
        if backend not in ops:
            continue
        g = build_graph(ds.graph, backend=backend)
        f_jit = jax.jit(lambda hh, gg=g: graphsum(hh, gg))
        ms16 = timeit(lambda: f_jit(h16), args.iters)
        ms41 = timeit(lambda: f_jit(h41) if h_dim != c else None, args.iters) if True else 0
        gbps16 = ds.graph.nnz * h_dim * dt.itemsize / ms16 / 1e6
        print(f"graphsum[{backend}] d={h_dim}: {ms16:8.2f} ms  ({gbps16:6.1f} GB/s gathered)")
        gbps41 = ds.graph.nnz * c * dt.itemsize / ms41 / 1e6
        print(f"graphsum[{backend}] d={c}: {ms41:8.2f} ms  ({gbps41:6.1f} GB/s gathered)")

    if "matmul" in ops:
        mm = jax.jit(lambda xx, ww: jnp.dot(xx, ww, preferred_element_type=jnp.float32))
        ms = timeit(lambda: mm(x, params["w1"]), args.iters)
        print(f"matmul XW1 [{n}x{f}]x[{f}x{h_dim}]: {ms:8.2f} ms")

    if "fwd" in ops or "bwd" in ops:
        from cuda_gcn_tpu.ops.loss import masked_cross_entropy

        g = build_graph(ds.graph, backend="ell")
        truth = jnp.asarray(np.where(ds.split == 1, ds.label, -1).astype(np.int32))

        if "fwd" in ops:
            fwd = jax.jit(lambda p: gcn.apply(p, g, x, training=False))
            print(f"full forward (ell): {timeit(lambda: fwd(params), args.iters):8.2f} ms")

        if "bwd" in ops:
            lf = jax.jit(jax.value_and_grad(
                lambda p: masked_cross_entropy(gcn.apply(p, g, x, training=False), truth)))
            print(f"full fwd+bwd (ell): {timeit(lambda: lf(params), args.iters):8.2f} ms")

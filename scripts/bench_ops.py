"""Op-level microbenchmarks on the live device: graphsum backends, matmuls,
full forward/backward — prints ms per op.

Measurement rules for the tunneled axon device (learned the hard way):
* pass arrays as jit ARGUMENTS (closing over them embeds them as HLO
  constants -> giant remote_compile requests, HTTP 413);
* return a SCALAR (sum of squares) so only bytes, not the result tensor,
  cross the tunnel (D2H is ~tens of MB/s);
* block_until_ready is unreliable over the tunnel — materialize via float().

Usage: python scripts/bench_ops.py [--dataset reddit] [--iters 5]
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
        float(fn(*args))  # scalar materialization = real sync
        times.append(time.perf_counter() - t0)
    return min(times) * 1000  # ms


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ops", default="ell,segment,matmul,fwd,bwd")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import load_bench_dataset
    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu.data.graph import build_graph
    from cuda_gcn_tpu.models import gcn
    from cuda_gcn_tpu.ops.graphsum import graphsum

    ops = args.ops.split(",")

    ds, name = load_bench_dataset(args.dataset, "data")
    cfg = ds.apply_config(GCNConfig(compute_dtype=args.dtype))
    dt = jnp.dtype(args.dtype)
    x = jnp.asarray(ds.dense_features(np.dtype(args.dtype)))
    params = gcn.init_params(jax.random.PRNGKey(0), cfg.layer_dims(), dtype=dt)
    n, f, h_dim, c = cfg.num_nodes, cfg.input_dim, cfg.hidden_dim, cfg.output_dim
    print(f"{name}: n={n} nnz={ds.graph.nnz} f={f} h={h_dim} c={c} dtype={dt}", flush=True)

    key = jax.random.PRNGKey(1)
    h16 = jax.random.normal(key, (n, h_dim), dt)
    h41 = jax.random.normal(key, (n, c), dt)

    gs_scalar = jax.jit(lambda hh, gg: jnp.sum(jnp.square(graphsum(hh, gg))))

    for backend in ("ell", "segment", "pallas"):
        if backend not in ops:
            continue
        try:
            g = build_graph(ds.graph, backend=backend)
            for h, d in ((h16, h_dim), (h41, c)):
                ms = timeit(gs_scalar, h, g, iters=args.iters)
                gbps = ds.graph.nnz * d * dt.itemsize / ms / 1e6
                print(f"graphsum[{backend}] d={d}: {ms:8.2f} ms  ({gbps:6.1f} GB/s gathered)",
                      flush=True)
        except Exception as e:  # keep going if one backend fails to compile
            print(f"graphsum[{backend}] FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    if "matmul" in ops:
        mm = jax.jit(lambda xx, ww: jnp.sum(jnp.square(
            jnp.dot(xx, ww, preferred_element_type=jnp.float32))))
        ms = timeit(mm, x, params["w1"], iters=args.iters)
        print(f"matmul XW1 [{n}x{f}]x[{f}x{h_dim}]: {ms:8.2f} ms", flush=True)

    if "fwd" in ops or "bwd" in ops:
        from cuda_gcn_tpu.ops.loss import masked_cross_entropy

        g = build_graph(ds.graph, backend="ell")
        truth = jnp.asarray(np.where(ds.split == 1, ds.label, -1).astype(np.int32))

        if "fwd" in ops:
            fwd = jax.jit(lambda p, gg, xx: jnp.sum(jnp.square(
                gcn.apply(p, gg, xx, training=False))))
            print(f"full forward (ell): {timeit(fwd, params, g, x, iters=args.iters):8.2f} ms",
                  flush=True)

        if "bwd" in ops:
            def loss_of(p, gg, xx, tt):
                return masked_cross_entropy(gcn.apply(p, gg, xx, training=False), tt)

            grad_norm = jax.jit(lambda p, gg, xx, tt: sum(
                jnp.sum(jnp.square(gr))
                for gr in jax.tree_util.tree_leaves(jax.grad(loss_of)(p, gg, xx, tt))))
            print(f"full fwd+bwd (ell): "
                  f"{timeit(grad_norm, params, g, x, truth, iters=args.iters):8.2f} ms", flush=True)

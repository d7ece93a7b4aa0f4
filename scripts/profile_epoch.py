"""Component-level timing of the reddit-profile train epoch on the live device.

Breaks the ~per-epoch cost into its constituent device programs so optimization
effort goes where the time is: graphsum fwd/transpose per backend and width,
input dropout (threefry RNG over N*F), the feature matmul, loss, and the full
train/eval steps.

Usage: python scripts/profile_epoch.py [--dataset reddit] [--backends bsr,segment]
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
    ap.add_argument("--backends", default="bsr,segment")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reorder", action="store_true",
                    help="apply the cached LPA locality permutation (production bench config)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import load_bench_dataset
    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu.data.graph import build_graph
    from cuda_gcn_tpu.models import gcn
    from cuda_gcn_tpu.ops.dropout import dropout
    from cuda_gcn_tpu.ops.graphsum import graphsum
    from cuda_gcn_tpu import train as train_mod

    ds, name = load_bench_dataset(args.dataset, "data")
    if args.reorder:
        from bench import maybe_reorder_cached

        ds = maybe_reorder_cached(ds, name)
    cfg = ds.apply_config(GCNConfig(compute_dtype=args.dtype))
    dt = jnp.dtype(args.dtype)
    n, f, hd, c = cfg.num_nodes, cfg.input_dim, cfg.hidden_dim, cfg.output_dim
    print(f"{name}: n={n} nnz={ds.graph.nnz} dims=({f},{hd},{c}) dtype={dt} "
          f"device={jax.devices()[0]}", flush=True)

    key = jax.random.PRNGKey(1)
    x = jnp.asarray(ds.dense_features(np.dtype(args.dtype)))
    h16 = jax.random.normal(key, (n, hd), dt)
    h41 = jax.random.normal(key, (n, c), dt)
    params = gcn.init_params(jax.random.PRNGKey(0), cfg.layer_dims(), dtype=dt)

    from cuda_gcn_tpu.ops.graphsum import _transpose_forward

    gs = jax.jit(lambda hh, gg: jnp.sum(jnp.square(graphsum(hh, gg))))
    gst = jax.jit(lambda hh, gg: jnp.sum(jnp.square(_transpose_forward(hh, gg))))

    for backend in args.backends.split(","):
        g = build_graph(ds.graph, backend=backend)
        extra = ""
        if backend == "bsr":
            k = int(g.bsr_tiles.shape[0])
            extra = (f" [tiles={k} ({k * g.bsr_tb * g.bsr_tb * 4 / 1e9:.2f} GB) "
                     f"residual_nnz={g.nnz}]")
        print(f"-- backend={backend}{extra}", flush=True)
        for h, d in ((h16, hd), (h41, c)):
            ms_f = timeit(gs, h, g, iters=args.iters)
            ms_t = timeit(gst, h, g, iters=args.iters)
            print(f"  graphsum d={d}: fwd {ms_f:8.2f} ms   transpose {ms_t:8.2f} ms", flush=True)

    drop = jax.jit(lambda xx, kk: jnp.sum(jnp.square(dropout(xx, 0.5, kk, True))))
    print(f"dropout(x) [{n}x{f}]: {timeit(drop, x, key, iters=args.iters):8.2f} ms", flush=True)

    mm = jax.jit(lambda xx, ww: jnp.sum(jnp.square(
        jnp.dot(xx, ww, preferred_element_type=jnp.float32))))
    print(f"matmul XW1 [{n}x{f}]x[{f}x{hd}]: {timeit(mm, x, params['w1'], iters=args.iters):8.2f} ms",
          flush=True)

    dmm = jax.jit(lambda xx, kk, ww: jnp.sum(jnp.square(
        jnp.dot(dropout(xx, 0.5, kk, True), ww, preferred_element_type=jnp.float32))))
    print(f"dropout+matmul fused: {timeit(dmm, x, key, params['w1'], iters=args.iters):8.2f} ms",
          flush=True)

    # full steps per backend
    for backend in args.backends.split(","):
        cfgb = ds.apply_config(GCNConfig(compute_dtype=args.dtype, graphsum_backend=backend))
        _, graph, xx, truths = train_mod.prepare(cfgb, ds)
        state = train_mod.create_state(cfgb)
        kw = dict(dropout_rate=cfgb.dropout, weight_decay=cfgb.weight_decay,
                  lr=cfgb.learning_rate)

        def one_train(state):
            s2, loss, acc = train_mod.train_step(state, graph, xx, truths[1], **kw)
            return s2, loss

        # train_step donates state; time it manually by chaining
        for _ in range(2):
            state, loss = one_train(state)
        float(loss)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            state, loss = one_train(state)
            float(loss)
            times.append(time.perf_counter() - t0)
        print(f"train_step[{backend}]: {min(times) * 1000:8.2f} ms", flush=True)

        ev = jax.jit(lambda p, gg, xx, tt: train_mod.eval_step(
            p, gg, xx, tt, weight_decay=cfgb.weight_decay)[0])
        print(f"eval_step[{backend}]:  {timeit(ev, state.params, graph, xx, truths[2], iters=args.iters):8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()

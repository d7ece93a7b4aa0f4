"""Chip probe for the Pallas BSR tile-contraction pipeline (ops/pallas_bsr.py)
vs the XLA formulation (ops/graphsum._tile_contract) — VERDICT round-3 next
item #5: the ~60 ms/epoch of tile streaming + intermediates is the largest
named, unattacked slice of the reddit per-epoch budget (docs/PERF.md).

Loads the bench reddit profile (LPA-reordered, bsr backend), extracts the tile
arrays, and times both contraction paths at the real scale (reddit-1x:
~22K [256,256] bf16 tiles, 911 block rows) for both live feature widths
(hidden=16, classes=41). Timing = scan of REPS dependent applications inside
ONE device program, materialized as a scalar (the 29 ms dispatch floor and the
15 MB/s D2H rule this tunnel, docs/PERF.md). Correctness = rel-err vs the XLA
path on-chip.

Run ON THE TPU (serialize with other chip users):
  nohup python scripts/exp_pallas_bsr.py > /tmp/exp_pallas_bsr.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import load_bench_dataset, maybe_reorder_cached
    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu import train as train_mod
    from cuda_gcn_tpu.ops.graphsum import _tile_contract
    from cuda_gcn_tpu.ops import pallas_bsr

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)

    dataset, name = load_bench_dataset("reddit", "data")
    dataset = maybe_reorder_cached(dataset, name)
    cfg = GCNConfig(epochs=1, graphsum_backend="bsr", reorder="none", seed=0)
    cfg, graph, x, truths = train_mod.prepare(cfg, dataset)
    k, tb, _ = graph.bsr_tiles.shape
    t_blocks, n = graph.bsr_nblocks, graph.n_nodes
    print(f"{name}: n={n} tiles K={k} tb={tb} T={t_blocks} "
          f"tile_dtype={graph.bsr_tiles.dtype}", flush=True)

    out = {"dataset": name, "K": int(k), "tb": int(tb), "T": int(t_blocks),
           "reps": REPS, "device": str(dev), "widths": {}}

    # graph arrays ride as jit ARGUMENTS (closing over them embeds 2.9 GB of
    # compile-time constants in every program — the CLAUDE.md trap)
    def xla_dense_part(tiles, rows, cols, h):
        d = h.shape[1]
        hT = jnp.pad(h, ((0, t_blocks * tb - n), (0, 0))).T.reshape(d, t_blocks, tb)
        outb = _tile_contract(tiles, rows, cols, hT, t_blocks, False)
        return outb.transpose(1, 0, 2).reshape(d, t_blocks * tb)[:, :n].T.astype(h.dtype)

    def pallas_dense_part(tiles, rows, cols, h):
        return pallas_bsr.bsr_tile_contract(tiles, rows, cols, h, n, t_blocks,
                                            variant="resident")

    def pallas_blk_dense_part(tiles, rows, cols, h):
        return pallas_bsr.bsr_tile_contract(tiles, rows, cols, h, n, t_blocks,
                                            variant="blocked")

    def rep_loop(fn):
        def run(tiles, rows, cols, h0):
            def step(h, _):
                o = fn(tiles, rows, cols, h)
                # bounded feedback so the next rep depends on this one
                return o / (jnp.max(jnp.abs(o)) + 1.0), None
            hN, _ = jax.lax.scan(step, h0, None, length=REPS)
            return jnp.sum(hN)
        return jax.jit(run)

    gargs = (graph.bsr_tiles, graph.bsr_rows, graph.bsr_cols)
    key = jax.random.PRNGKey(0)
    for d in (16, 32, 41, 82):
        h = jax.random.normal(key, (n, d), jnp.float32)

        # correctness on-chip
        ref = np.asarray(jax.jit(xla_dense_part)(*gargs, h))
        got = np.asarray(jax.jit(pallas_dense_part)(*gargs, h))
        rel = float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9))
        print(f"d={d}: on-chip rel err pallas vs xla = {rel:.3e}", flush=True)

        res = {"rel_err": rel}
        for label, fn in (("xla", xla_dense_part),
                          ("pallas", pallas_dense_part),
                          ("pallas_blk", pallas_blk_dense_part)):
            run = rep_loop(fn)
            t0 = time.perf_counter()
            float(run(*gargs, h))  # compile + first run
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(*gargs, h))
                times.append(time.perf_counter() - t0)
            per_pass = (min(times)) / REPS
            gbps = k * tb * tb * graph.bsr_tiles.dtype.itemsize / per_pass / 1e9
            print(f"d={d} {label}: {per_pass * 1e3:.2f} ms/pass "
                  f"(tiles at {gbps:.0f} GB/s; compile {compile_s:.1f}s)",
                  flush=True)
            res[label] = {"ms_per_pass": per_pass * 1e3, "tile_gbps": gbps,
                          "compile_s": compile_s}
        res["speedup"] = res["xla"]["ms_per_pass"] / res["pallas"]["ms_per_pass"]
        print(f"d={d}: pallas speedup {res['speedup']:.2f}x", flush=True)
        out["widths"][str(d)] = res

    path = "artifacts/exp_pallas_bsr.json"
    os.makedirs("artifacts", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()

"""Closed-avenue probe: would smaller BSR tiles shrink the residual?

The reddit epoch is residual-dominated (4.52M residual edges x ~11 ns
~= 50 ms/pass vs ~14 ms of tile streaming), so the obvious lever is
densifying more of the residual with SMALLER tiles (a [128,128] bf16 tile
streams 32 KB -> break-even 16 edges; [64,64] -> 4 edges, vs 64 edges for
the production [256,256]). This measures the residual's block-density
histogram at those sizes to bound the possible win before building anything:

  python scripts/exp_tile_density.py --dataset reddit

Result (synth-reddit, LPA-reordered, 4.52M residual edges after the
production 256-tile pass — docs/PERF.md "smaller tiles"):

  tb=128 @ break-even:  5,312 tiles,   113,834 edges ( 2.5%), 174 MB stream
  tb=64  @ break-even: 56,931 tiles,   336,013 edges ( 7.4%), 466 MB stream

Net at tb=64: saves 336K x 11 ns ~= 3.7 ms of gathers, pays 466 MB / 200
GB/s ~= 2.3 ms of stream -> ~1.4 ms/pass (~3% of the epoch) BEFORE the
per-tile einsum fixed costs that a 2.6x tile-count increase multiplies.
The residual after the 256-tile pass is genuinely scatter-like; the
smaller-tile avenue is closed.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit")
    ap.add_argument("--sizes", default="128,64")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bench import load_bench_dataset, maybe_reorder_cached
    from cuda_gcn_tpu.data.graph import CSR, build_graph

    ds, name = load_bench_dataset(args.dataset, "data")
    ds = maybe_reorder_cached(ds, name)
    g = build_graph(CSR(ds.graph.indptr, ds.graph.indices))
    src = np.asarray(g.src).astype(np.int64)
    dst = np.asarray(g.dst).astype(np.int64)
    m = src.shape[0]
    print(f"{name}: residual edges after production tile pass: {m}")
    for tb in (int(s) for s in args.sizes.split(",")):
        nb = ds.num_nodes // tb + 2
        _, cnt = np.unique(src // tb * nb + dst // tb, return_counts=True)
        be = tb * tb * 2 / 2048  # break-even edges/tile at 2048 B-per-edge
        for mult in (1.0, 0.5):
            sel = cnt >= be * mult
            edges = int(cnt[sel].sum())
            print(f"tb={tb} be={be:.0f} x{mult}: tiles {int(sel.sum())}, "
                  f"edges {edges} ({edges / m:.1%}), "
                  f"stream {int(sel.sum()) * tb * tb * 2 / 1e6:.0f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())

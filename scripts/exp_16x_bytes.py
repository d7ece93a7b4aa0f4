"""Host-side argument-byte breakdown for a bench profile (no TPU needed).

Replicates bench.py's prepare path on the CPU platform and walks the
resulting (graph, x, truths, state) pytrees, printing bytes per leaf path
with TPU lane padding applied (minor dim padded to 128 for >=2D arrays,
sublane 8 for the second-minor) — i.e. what the arrays will actually occupy
in HBM as program arguments. Used to diagnose the measured 16x OOM
(arguments 14.53 GB, /tmp/bench16x.log) against auto_tile_budget's reserve
model (data/graph.py:738).

Usage:
  python scripts/exp_16x_bytes.py --dataset reddit16x --compute-dtype bfloat16 \
      --feature-matmul sparse
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def padded_bytes(shape, itemsize):
    if len(shape) == 0:
        return itemsize
    dims = list(shape)
    # minor dim -> multiple of (8*4/itemsize? no: lanes are 128 regardless);
    # second-minor -> multiple of 8 (f32) / 16 (bf16) sublanes. Use the f32
    # sublane count scaled by 4/itemsize like the runtime does.
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        sub = max(8 * 4 // max(itemsize, 1), 8)
        dims[-2] = -(-dims[-2] // sub) * sub
    n = 1
    for d in dims:
        n *= d
    return n * itemsize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit16x")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--feature-matmul", default="sparse")
    ap.add_argument("--backend", default="bsr")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bench import load_bench_dataset, maybe_reorder_cached
    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu import train as train_mod

    dataset, name = load_bench_dataset(args.dataset, "data")
    dataset = maybe_reorder_cached(dataset, name)
    cfg = GCNConfig(epochs=1, graphsum_backend=args.backend, reorder="none",
                    compute_dtype=args.compute_dtype, seed=0,
                    feature_matmul=args.feature_matmul)
    cfg, graph, x, truths = train_mod.prepare(cfg, dataset)
    state = train_mod.create_state(cfg)

    groups = {"graph": graph, "x": x, "truths": truths, "state": state}
    rows = []
    total = 0
    for gname, tree in groups.items():
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in leaves_with_paths:
            if not hasattr(leaf, "shape"):
                continue
            b = padded_bytes(leaf.shape, leaf.dtype.itemsize)
            total += b
            rows.append((gname + jax.tree_util.keystr(path), tuple(leaf.shape),
                         str(leaf.dtype), b))
    rows.sort(key=lambda r: -r[3])
    print(f"TOTAL padded argument bytes: {total / (1 << 30):.2f} GiB")
    for path, shape, dt, b in rows[:40]:
        print(f"{b / (1 << 20):10.1f} MiB  {dt:10s} {str(shape):24s} {path}")
    with open("/tmp/bytes16x.json", "w") as f:
        json.dump({"total_gib": total / (1 << 30),
                   "rows": [{"path": p, "shape": s, "dtype": d, "bytes": b}
                            for p, s, d, b in rows]}, f, indent=1, default=str)


if __name__ == "__main__":
    main()

"""Probe: feature_matmul='sparse' vs 'dense' on the single-chip trainer.

The reference's input matmul IS sparse (src/seq/module.cpp SparseMatmul over
the CSR feature matrix); our default is dense because an MXU matmul beats a
65M-gather segment sum wherever the dense table fits. But the dense input
table is the single biggest resident at scale (9.5 GB at 16x, 4.5 GB at 8x)
and input dropout pays RNG over N*F dense elements (12 ms/epoch at reddit)
versus only the nnz values on the sparse path. This measures both ends:

  python scripts/exp_sparse_features.py --dataset reddit --epochs 10

Writes one JSON line per mode to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--modes", default="dense,sparse")
    ap.add_argument("--compute-dtype", default="float32")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from bench import load_bench_dataset, maybe_reorder_cached
    from cuda_gcn_tpu import train as train_mod
    from cuda_gcn_tpu.config import GCNConfig

    ds, name = load_bench_dataset(args.dataset, "data")
    ds = maybe_reorder_cached(ds, name)

    for mode in args.modes.split(","):
        cfg = GCNConfig(epochs=args.epochs, early_stopping=0,
                        compute_dtype=args.compute_dtype, feature_matmul=mode,
                        reorder="none")  # bench dataset is already LPA-reordered
        t0 = time.perf_counter()
        res = train_mod.run(cfg, ds, verbose=False)
        wall = time.perf_counter() - t0
        out = {"mode": mode, "dataset": name, "epochs": res.epochs_run,
               "train_s": round(res.total_train_time, 3),
               "ms_per_epoch": round(1e3 * res.total_train_time / max(res.epochs_run, 1), 2),
               "wall_s": round(wall, 1), "test_acc": round(res.test_acc, 5)}
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

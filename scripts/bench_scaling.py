"""Multi-chip scaling benchmark: edges/s through the sharded halo-exchange
trainer at mesh sizes 1..P (BASELINE.json north star: >=80% linear edges/s
scaling on reddit full-graph training).

On a real multi-chip slice this measures true ICI scaling. On this repo's
bench environment only ONE real chip is reachable, so by default it runs on a
virtual CPU mesh (`--platform cpu` with forced host devices) — that validates
the partitioner/collective code path and reports the halo-volume statistics
that determine real scaling (boundary fraction per part), but the wall-clock
numbers are NOT chip numbers. Run on a pod with `--platform tpu`.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/bench_scaling.py --dataset pubmed --parts 1,2,4,8 --platform cpu
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="pubmed")
    ap.add_argument("--parts", default="1,2,4,8")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--interior", default="auto", choices=["auto", "segment"],
                    help="interior aggregation: auto (tiles+blocked for large blocks) or plain sorted-segment")
    ap.add_argument("--out", default=None, metavar="PATH",
                    help="also write the JSON result to PATH (committed artifact)")
    ap.add_argument("--stats-only", action="store_true",
                    help="partition-quality stats only (no training) — the "
                         "useful output on a virtual mesh, where wall-clock is "
                         "not a chip number anyway")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from bench import load_bench_dataset
    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu.parallel import sharded
    from cuda_gcn_tpu.parallel.partition import partition_graph
    from cuda_gcn_tpu import train as train_mod

    ds0, name = load_bench_dataset(args.dataset, "data")
    # LPA labels computed once; the cluster LAYOUT is per-P (tail clusters
    # greedy-spread across parts, reorder.partition_aware_order), so the
    # dataset is relabeled inside the P loop below.
    from cuda_gcn_tpu.data.reorder import (label_propagation,
                                           lpa_cache_key,
                                           partition_layout,
                                           reorder_dataset)

    # LPA labels are the expensive host step at scale (~minutes at 32x on one
    # core even through the native kernel); cache them like bench.py caches
    # the locality permutation so stats reruns only pay the per-P layout.
    import os

    from bench import CACHE_DIR

    # filename keyed on (graph contents, LPA_VERSION) so stale labels from an
    # older graph build or LPA algorithm are never silently reused
    key = lpa_cache_key(ds0.graph.indptr, ds0.graph.indices)
    lpa_cache = os.path.join(CACHE_DIR, f"{name}.lpa.{key}.npy")
    if os.path.exists(lpa_cache):
        labels = np.load(lpa_cache)
        print(f"loaded cached LPA labels for {name} ({key})", file=sys.stderr)
    else:
        labels = label_propagation(ds0.graph.indptr, ds0.graph.indices)
        os.makedirs(CACHE_DIR, exist_ok=True)
        np.save(lpa_cache, labels)
    degrees = np.diff(ds0.graph.indptr.astype(np.int64))
    nnz = ds0.graph.nnz
    print(f"{name}: n={ds0.num_nodes} nnz={nnz} devices={jax.device_count()} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr, flush=True)

    results = []
    for p in (int(s) for s in args.parts.split(",")):
        if not args.stats_only and p > jax.device_count():
            # stats-only runs never touch a device; any P is computable
            print(f"skip P={p}: only {jax.device_count()} devices", file=sys.stderr)
            continue
        perm, cuts = partition_layout(ds0.graph.indptr, ds0.graph.indices,
                                      labels, p, weights=degrees)
        ds = reorder_dataset(ds0, perm).dataset
        pg = partition_graph(ds.graph, p, cuts=cuts)
        # --- partition-quality stats (VERDICT round-1 item 4): per-part halo
        # fraction, padded-vs-actual send volume (hmax blow-up), edge balance
        real_edges = (pg.coef > 0).sum(axis=1)          # [P]
        bnd_edges = (pg.b_coef > 0).sum(axis=1)         # [P]
        boundary_frac = float(bnd_edges.sum() / max(nnz, 1))
        # true halo rows used: unique halo-buffer columns touched by real
        # boundary edges, per receiving part
        actual_rows = sum(
            len(np.unique(pg.b_dst[q][pg.b_coef[q] > 0]))
            for q in range(pg.n_parts))
        padded_rows = sum(int(sec.size) for sec in pg.send_secs)
        stats = dict(
            block=pg.block,
            halo_space=pg.halo_space,
            hmax_k=[int(h) for h in pg.hmax_k],
            send_rows_padded=padded_rows,
            send_pad_overhead=round(padded_rows / max(actual_rows, 1), 3),
            edge_balance=round(float(real_edges.max() / max(real_edges.mean(), 1)), 3),
            per_part_boundary_frac=[round(float(b / max(t, 1)), 4)
                                    for b, t in zip(bnd_edges, real_edges)],
        )
        if args.stats_only:
            results.append(dict(parts=p, boundary_fraction=round(boundary_frac, 4),
                                partition=stats))
            print(f"P={p}: boundary={boundary_frac * 100:.1f}%  "
                  f"pad_overhead={stats['send_pad_overhead']}x  "
                  f"balance={stats['edge_balance']}", file=sys.stderr, flush=True)
            continue
        mesh = sharded.make_mesh(p)
        # prepare_sharded applies the SAME P-aware cluster layout (the cached
        # labels are passed in, so the stats above match it at zero recompute)
        cfg = GCNConfig(epochs=args.epochs, seed=0,
                        graphsum_backend="segment" if args.interior == "segment" else "auto")
        cfg, inputs, truths = sharded.prepare_sharded(cfg, ds0, mesh,
                                                      lpa_labels=labels)
        run = sharded.make_sharded_run_epochs(mesh, cfg)
        state = train_mod.create_state(cfg)
        # warmup/compile (chunked: bounds device-program runtime on the tunnel)
        state, m = sharded.run_sharded_epochs_chunked(
            mesh, cfg, state, inputs, truths[1], truths[2], epochs=args.epochs, run=run)
        state = train_mod.create_state(cfg)
        t0 = time.perf_counter()
        state, m = sharded.run_sharded_epochs_chunked(
            mesh, cfg, state, inputs, truths[1], truths[2], epochs=args.epochs, run=run)
        dt = time.perf_counter() - t0
        passes = 4 * args.epochs + 2
        eps = nnz * passes / dt
        results.append(dict(parts=p, seconds=round(dt, 4),
                            edges_per_s=round(eps),
                            boundary_fraction=round(boundary_frac, 4),
                            partition=stats))
        print(f"P={p}: {dt:.3f}s  {eps:,.0f} edge-passes/s  "
              f"boundary={boundary_frac * 100:.1f}%  "
              f"pad_overhead={stats['send_pad_overhead']}x  "
              f"balance={stats['edge_balance']}", file=sys.stderr, flush=True)

    if results and "edges_per_s" in results[0]:
        base = results[0]["edges_per_s"] / results[0]["parts"]
        for r in results:
            r["scaling_efficiency"] = round(r["edges_per_s"] / (base * r["parts"]), 3)
    payload = {"dataset": name, "epochs": args.epochs,
               "platform": jax.devices()[0].platform,
               "n_nodes": ds0.num_nodes, "nnz": nnz, "results": results}
    if jax.devices()[0].platform != "tpu" and any("seconds" in r for r in results):
        # the caveat must live IN the artifact, not just in this docstring
        # (VERDICT round-2 weak #3): a reader of the JSON alone must not
        # mistake time-sliced one-host wall-clocks for chip scaling
        payload["caveat"] = (
            "VIRTUAL MESH: all devices time-slice one CPU host, so 'seconds', "
            "'edges_per_s' and 'scaling_efficiency' measure the harness, NOT "
            "chip scaling. Only the partition stats (boundary_fraction, "
            "send_pad_overhead, edge_balance, hmax_k) are hardware-independent. "
            "For the analytic chip-scaling projection see "
            "artifacts/predicted_scaling_*.json (scripts/predict_scaling.py).")
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

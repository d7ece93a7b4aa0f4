"""End-to-end reddit-1x training on a P=2 virtual CPU mesh, with metric
parity vs the single-chip path (VERDICT round-3 next-item #4a: committed
reddit-SCALE multi-chip executable evidence, not just the pubmed-scale
dryrun). P=2 dodges XLA:CPU's 40 s collective-rendezvous arrival timeout
that killed the 16x P=8 attempt (docs/PERF.md): half the per-step imbalance,
4x the per-device rendezvous budget on this one-core host.

Two legs, both over the full synth-reddit profile (233K nodes / 21M nnz):

1. ``exact``  — dropout=0, identical initial state: the sharded fused loop's
   per-epoch metrics must track the single-chip fused loop within fp
   reduction-order tolerance (metrics are aggregate sums, so the LPA
   relabeling on the sharded side is semantics-preserving).
2. ``converged`` — the bench profile's standard config (dropout on, distinct
   per-device RNG streams): final test accuracy must match the single-chip
   run within 0.02 (the parity-script tolerance, scripts/parity_vs_reference.py).

Writes artifacts/mesh_reddit_p2.json. Run:
  python scripts/exp_mesh_reddit_p2.py [--epochs 100] [--exact-epochs 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CACHE_DIR, load_bench_dataset  # noqa: E402
from cuda_gcn_tpu.config import GCNConfig  # noqa: E402
from cuda_gcn_tpu import train as train_mod  # noqa: E402
from cuda_gcn_tpu.data.graph import build_graph  # noqa: E402
from cuda_gcn_tpu.parallel import sharded  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def single_chip(ds, epochs, dropout):
    cfg = ds.apply_config(GCNConfig(epochs=epochs, graphsum_backend="segment",
                                    reorder="none", seed=0))
    cfg, graph, x, truths = train_mod.prepare(cfg, ds)
    rate = cfg.dropout if dropout is None else dropout
    state = train_mod.create_state(cfg)
    t0 = time.perf_counter()
    state, metrics = train_mod.run_epochs_chunked(
        state, graph, x, truths[1], truths[2], epochs=epochs,
        dropout_rate=rate, weight_decay=cfg.weight_decay, lr=cfg.learning_rate)
    wall = time.perf_counter() - t0
    tl, ta = train_mod.eval_step(state.params, graph, x, truths[3],
                                 weight_decay=cfg.weight_decay)
    return ([np.asarray(m) for m in metrics],
            dict(test_loss=float(tl), test_acc=float(ta), wall_s=wall))


def mesh_p2(ds, name, epochs, dropout):
    mesh = sharded.make_mesh(2)
    cfg = ds.apply_config(GCNConfig(epochs=epochs, graphsum_backend="segment",
                                    seed=0))
    rate = cfg.dropout if dropout is None else dropout
    cfg = dataclasses_replace(cfg, dropout=rate)
    # reuse the keyed LPA label cache the scaling-stats runs write
    from cuda_gcn_tpu.data.reorder import lpa_cache_key

    key = lpa_cache_key(ds.graph.indptr, ds.graph.indices)
    # the key hashes the adjacency itself, so any profile VARIANT of the same
    # graph (e.g. synth-reddit-slope) can reuse the base profile's labels
    import glob

    cands = glob.glob(os.path.join(CACHE_DIR, f"*.lpa.{key}.npy"))
    labels = np.load(cands[0]) if cands else None
    t0 = time.perf_counter()
    cfg, inputs, truths = sharded.prepare_sharded(cfg, ds, mesh,
                                                  lpa_labels=labels)
    prep = time.perf_counter() - t0
    log(f"  prepare_sharded: {prep:.1f}s (block={inputs.block}, "
        f"halo={inputs.boundary.n_in})")
    state = train_mod.create_state(cfg)
    t0 = time.perf_counter()
    state, metrics = sharded.run_sharded_epochs_chunked(
        mesh, cfg, state, inputs, truths[1], truths[2], epochs=epochs)
    wall = time.perf_counter() - t0
    ev = sharded.make_sharded_eval_step(mesh, cfg)
    tl, ta = ev(state.params, inputs, truths[3])
    return ([np.asarray(m) for m in metrics],
            dict(test_loss=float(tl), test_acc=float(ta), wall_s=wall,
                 prepare_s=prep))


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="reddit",
                    help="reddit, or reddit-slope: same graph, converged "
                         "accuracy strictly below the label-noise ceiling so "
                         "the parity diff carries signal (VERDICT r4 weak #6)")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--exact-epochs", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        suffix = "" if args.dataset == "reddit" else f"_{args.dataset.removeprefix('reddit-')}"
        args.out = f"artifacts/mesh_reddit{suffix}_p2.json"

    assert jax.device_count() >= 2 and jax.devices()[0].platform == "cpu"
    ds, name = load_bench_dataset(args.dataset, "data")
    log(f"{name}: n={ds.num_nodes} nnz={ds.graph.nnz} devices={jax.device_count()}")

    out = {"dataset": name, "n_nodes": int(ds.num_nodes),
           "nnz": int(ds.graph.nnz), "parts": 2,
           "platform": "cpu-virtual-mesh"}

    # --- leg 1: exact (dropout=0, same init) --------------------------------
    log(f"exact leg: {args.exact_epochs} epochs, dropout=0")
    m1, r1 = single_chip(ds, args.exact_epochs, dropout=0.0)
    m2, r2 = mesh_p2(ds, name, args.exact_epochs, dropout=0.0)
    names = ("train_loss", "train_acc", "val_loss", "val_acc")
    diffs = {k: float(np.max(np.abs(a - b)))
             for k, a, b in zip(names, m1, m2)}
    log(f"  per-epoch max |diff|: {diffs}")
    exact_tol = 5e-3  # fp reduction-order drift over 21M-edge sums, amplified
    exact_ok = all(v <= exact_tol for v in diffs.values())
    out["exact"] = dict(epochs=args.exact_epochs, max_abs_metric_diff=diffs,
                        tolerance=exact_tol, ok=bool(exact_ok),
                        single=r1, mesh_p2=r2)

    # --- leg 2: converged (profile config, dropout on) ----------------------
    log(f"converged leg: {args.epochs} epochs, profile dropout")
    m1, r1 = single_chip(ds, args.epochs, dropout=None)
    m2, r2 = mesh_p2(ds, name, args.epochs, dropout=None)
    acc_diff = abs(r1["test_acc"] - r2["test_acc"])
    conv_ok = acc_diff <= 0.02
    out["converged"] = dict(
        epochs=args.epochs, single=r1, mesh_p2=r2,
        final_val_acc_single=float(m1[3][-1]), final_val_acc_mesh=float(m2[3][-1]),
        test_acc_diff=float(acc_diff), tolerance=0.02, ok=bool(conv_ok))

    out["verdict"] = "ok" if (exact_ok and conv_ok) else "FAIL"
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}: verdict={out['verdict']} "
        f"(exact diffs {diffs}; test acc {r1['test_acc']:.5f} vs "
        f"{r2['test_acc']:.5f})")
    if out["verdict"] != "ok":
        sys.exit(1)


if __name__ == "__main__":
    main()

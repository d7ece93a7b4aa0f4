"""Cross-implementation parity check against the reference sequential engine.

Builds the reference's CPU binary (`make seq` in a scratch copy of
/root/reference — nothing is copied into this repo), runs it on a dataset
written in the 3-file format, runs our framework on the same files, and
compares final test accuracy and convergence. This mirrors how the reference
itself was validated — cross-implementation comparison against Kipf's
TensorFlow implementation (report §3 "Evaluation"); exact per-step equality is
impossible because the reference seeds its RNG from time(NULL)
(src/seq/rand.cpp:7).

Usage:
    python scripts/parity_vs_reference.py [--dataset synth-cora] [--epochs 100]
            [--runs 3] [--reference /root/reference]

Prints a comparison table and exits nonzero if |acc_ours - acc_ref| > tolerance.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_reference(ref_dir: str, work: str) -> str:
    src = os.path.join(work, "refbuild")
    shutil.copytree(ref_dir, src)
    subprocess.run(["make", "seq"], cwd=src, check=True, capture_output=True)
    for cand in ("seq_gcn", "gcn-seq"):  # Makefile emits seq_gcn; README says gcn-seq
        p = os.path.join(src, cand)
        if os.path.exists(p):
            return p
    raise FileNotFoundError("reference seq binary not found after make")


def run_reference(binary: str, data_dir: str, name: str) -> dict:
    # the reference resolves datasets relative to CWD as data/<name>.*
    cwd = os.path.dirname(data_dir)
    assert os.path.basename(data_dir) == "data", "reference expects a data/ dir"
    out = subprocess.run([binary, name], cwd=cwd, check=True, capture_output=True,
                         text=True, timeout=3600).stdout
    m = re.search(r"test_loss=([\d.]+) test_acc=([\d.]+)", out)
    t = re.search(r"total training time=([\d.]+)", out)
    accs = re.findall(r"val_acc=([\d.]+)", out)
    return {"test_loss": float(m.group(1)), "test_acc": float(m.group(2)),
            "train_time": float(t.group(1)),
            "final_val_acc": float(accs[-1]) if accs else None}


def run_ours(data_dir: str, name: str, epochs: int, seed: int, platform: str | None) -> dict:
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu.data.parser import load_dataset
    from cuda_gcn_tpu import train as train_mod

    ds = load_dataset(name, data_dir=data_dir)
    cfg = GCNConfig(epochs=epochs, seed=seed)
    r = train_mod.run(cfg, ds, verbose=False)
    return {"test_loss": r.test_loss, "test_acc": r.test_acc,
            "train_time": r.total_train_time,
            "final_val_acc": r.history[-1]["val_acc"]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synth-cora")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3, help="reference runs (RNG varies by time)")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--tolerance", type=float, default=0.05)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force JAX platform for our run (accuracy is platform-independent)")
    ap.add_argument("--out", default=None,
                    help="write the comparison as a JSON artifact")
    args = ap.parse_args()

    from cuda_gcn_tpu.data.synthetic import (PROFILES, VARIANTS,
                                             make_synthetic, write_dataset)

    with tempfile.TemporaryDirectory() as work:
        data_dir = os.path.join(work, "data")
        name = args.dataset.removeprefix("synth-")
        if args.dataset in PROFILES or args.dataset in VARIANTS:
            ds = make_synthetic(args.dataset, seed=0)
            print(f"writing {args.dataset} to {data_dir} ...", file=sys.stderr)
            write_dataset(ds, data_dir, name)
        else:
            raise SystemExit(f"unknown dataset {args.dataset}")

        print("building reference gcn-seq ...", file=sys.stderr)
        binary = build_reference(args.reference, work)

        ref_runs = []
        for i in range(args.runs):
            r = run_reference(binary, data_dir, name)
            ref_runs.append(r)
            print(f"reference run {i}: test_acc={r['test_acc']:.5f} "
                  f"time={r['train_time']:.2f}s", file=sys.stderr)

        ours = run_ours(data_dir, name, args.epochs, seed=0, platform=args.platform)
        print(f"ours:           test_acc={ours['test_acc']:.5f} "
              f"time={ours['train_time']:.2f}s", file=sys.stderr)

        ref_acc = sum(r["test_acc"] for r in ref_runs) / len(ref_runs)
        diff = abs(ours["test_acc"] - ref_acc)
        print(f"\nreference mean test_acc={ref_acc:.5f} (n={len(ref_runs)}), "
              f"ours={ours['test_acc']:.5f}, |diff|={diff:.5f}, tol={args.tolerance}")
        speed = (sum(r["train_time"] for r in ref_runs) / len(ref_runs)) / max(ours["train_time"], 1e-9)
        print(f"speed vs gcn-seq: {speed:.2f}x")
        if args.out:
            import json

            with open(args.out, "w") as fh:
                json.dump({"dataset": args.dataset, "epochs": args.epochs,
                           "tolerance": args.tolerance,
                           "reference_runs": ref_runs,
                           "reference_mean_test_acc": ref_acc,
                           "ours": ours, "abs_diff": diff,
                           "verdict": "PARITY OK" if diff <= args.tolerance
                                      else "PARITY FAIL"}, fh, indent=1)
            print(f"wrote {args.out}", file=sys.stderr)
        if diff > args.tolerance:
            print("PARITY FAIL")
            return 1
        print("PARITY OK")
        return 0


if __name__ == "__main__":
    sys.exit(main())

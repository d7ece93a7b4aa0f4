"""Metrics logging: CSV / JSONL dumps of the per-epoch history.

The reference's observability is printf-only (gcn.cpp:139-140; SURVEY.md §5).
The stdout contract is preserved by train.run; this adds machine-readable dumps
for the benchmark harness and experiment tracking.
"""

from __future__ import annotations

import csv
import json

FIELDS = ["epoch", "train_loss", "train_acc", "val_loss", "val_acc", "time"]


def grad_norm(tree) -> float:
    """L2 norm over a gradient pytree — the debug helper the reference exposes
    as Variable::grad_norm (src/seq/variable.cpp:36-43), lifted to pytrees."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return 0.0
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)))


def write_history_csv(path: str, history: list[dict]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        for row in history:
            w.writerow({k: row[k] for k in FIELDS})


def write_history_jsonl(path: str, history: list[dict], run_meta: dict | None = None) -> None:
    with open(path, "w") as f:
        if run_meta:
            f.write(json.dumps({"meta": run_meta}) + "\n")
        for row in history:
            f.write(json.dumps(row) + "\n")

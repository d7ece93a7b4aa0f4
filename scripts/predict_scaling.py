"""Analytic multi-chip scaling projection for the >=80% edges/s north star.

Real multi-chip hardware is unreachable in this environment (one tunneled
chip; a virtual CPU mesh time-slices one core and measures nothing — see the
caveat inside artifacts/scaling_pubmed_virtual8.json). This model instead
projects chip scaling from quantities that ARE measured and committed:

* per-part work and halo structure from the committed partition-quality
  artifacts (scripts/bench_scaling.py --stats-only): per-part edge counts /
  balance, per-offset halo section sizes ``hmax_k``, boundary fractions;
* per-edge compute cost from the measured single-chip sharded trainer
  (docs/PERF.md "Sharded path": P=1 reddit 313 ms/epoch over 21.0M nnz x 4
  fused passes = 3.73 ns/edge-pass, round-2 re-verified), with the flat
  12.3 ns/row HBM-gather cost as the pessimistic bound;
* a stated ICI bandwidth assumption (below) for the ppermute rounds.

Comm model: the halo exchange runs P-1 ppermute rounds; round k shifts
[hmax_k, d] activations by ring offset k, costing min(k, P-k) hops on a
bidirectional ring. Per-epoch link traffic (worst single link, one
direction) = sum_k hmax_k * min(k, P-k) * row_bytes * passes. Projections
are reported both fully-overlapped (max(compute, comm) — the design overlaps
interior aggregation with the rounds, parallel/sharded.halo_graphsum) and
unoverlapped (compute + comm, the pessimistic bound).

Writes artifacts/predicted_scaling_<name>.json. Usage:
    python scripts/predict_scaling.py artifacts/partition_stats_reddit.json
"""

from __future__ import annotations

import json
import sys

# --- measured chip model (docs/PERF.md; axon TPU v5 lite) ---
C_EDGE_NS_MEASURED = 3.73   # sharded P=1 reddit: 313 ms / (21.0M nnz * 4 passes)
C_EDGE_NS_PESSIMISTIC = 12.3  # flat HBM random-row gather floor
PASSES_PER_EPOCH = 4        # fused pair loop (train.run_epochs pass-fusion)
# Per-epoch halo row*width traffic (reddit profile dims 16 hidden / 41 out):
# each layer's FORWARD exchange ships the width-concatenated [zt|ze] pair
# (2*16 + 2*41), and the BACKWARD ships TRAIN width only — the fused pair's
# hand transpose differentiates at train width (parallel/sharded.py
# halo_graphsum_pair; round 3's model billed the transposes at pair width,
# which the round-4 primitive made both untrue and unnecessary).
WIDTH_SUM = (2 * 16 + 2 * 41) + (16 + 41)
# Wire format of halo payloads: bf16 by default (GCNConfig.halo_dtype,
# parallel/sharded._cast_payload — tests/test_parallel.py pins that every
# lowered collective_permute operand is bf16), halving the round-3 f32 bytes.
ROW_BYTES_PER_WIDTH = 2
# --- stated assumption: ICI effective bandwidth per link per direction.
# TPU v5e ICI is ~45 GB/s per direction per link (public spec order); the
# model bills every round's traffic to ONE link+direction, which double-counts
# vs a real bidirectional ring — conservative.
ICI_GBPS = 45.0


def project(stats_path: str) -> dict:
    doc = json.load(open(stats_path))
    nnz = doc["nnz"]
    out = {
        "source_stats": stats_path,
        "model": {
            "c_edge_ns_measured": C_EDGE_NS_MEASURED,
            "c_edge_ns_pessimistic": C_EDGE_NS_PESSIMISTIC,
            "ici_gbps_per_link_dir_assumed": ICI_GBPS,
            "passes_per_epoch": PASSES_PER_EPOCH,
            "note": ("analytic projection from committed partition stats + "
                     "measured single-chip operator cost; NOT a hardware "
                     "measurement (no multi-chip hardware reachable)"),
        },
        "dataset": doc["dataset"],
        "nnz": nnz,
        "results": [],
    }
    t1 = {}  # P=1 epoch seconds per cost model
    for c_name, c_ns in (("measured", C_EDGE_NS_MEASURED),
                         ("pessimistic", C_EDGE_NS_PESSIMISTIC)):
        t1[c_name] = nnz * PASSES_PER_EPOCH * c_ns * 1e-9
    for r in doc["results"]:
        p = r["parts"]
        st = r["partition"]
        balance = st["edge_balance"]
        hmax_k = st["hmax_k"]
        # worst single-link one-direction traffic per epoch (see module doc)
        link_rows = sum(h * min(k + 1, p - k - 1) for k, h in enumerate(hmax_k))
        comm_s = (link_rows * WIDTH_SUM * ROW_BYTES_PER_WIDTH
                  * PASSES_PER_EPOCH / 4) / (ICI_GBPS * 1e9)
        entry = {"parts": p, "boundary_fraction": r["boundary_fraction"],
                 "edge_balance": balance, "comm_s_per_epoch": round(comm_s, 6)}
        for c_name, c_ns in (("measured", C_EDGE_NS_MEASURED),
                             ("pessimistic", C_EDGE_NS_PESSIMISTIC)):
            comp_s = (nnz / p) * balance * PASSES_PER_EPOCH * c_ns * 1e-9
            t_overlap = max(comp_s, comm_s)
            t_serial = comp_s + comm_s
            entry[f"predicted_epoch_s_{c_name}"] = round(t_overlap, 6)
            entry[f"efficiency_{c_name}_overlapped"] = round(
                t1[c_name] / (p * t_overlap), 4)
            entry[f"efficiency_{c_name}_unoverlapped"] = round(
                t1[c_name] / (p * t_serial), 4)
            entry[f"edge_passes_per_s_{c_name}"] = round(
                nnz * PASSES_PER_EPOCH / t_overlap)
        out["results"].append(entry)
    # north-star verdict at the largest P present, measured-cost overlapped
    top = max(out["results"], key=lambda e: e["parts"])
    eff = top["efficiency_measured_overlapped"]
    out["north_star"] = {
        "target": 0.80,
        "at_parts": top["parts"],
        "efficiency_measured_overlapped": eff,
        "efficiency_measured_unoverlapped": top["efficiency_measured_unoverlapped"],
        "clears_80pct": bool(min(
            eff, top["efficiency_measured_unoverlapped"]) >= 0.80),
        "binding_term": ("edge_balance" if top["edge_balance"] > 1.1
                         else "comm" if top["comm_s_per_epoch"]
                         > top["predicted_epoch_s_measured"] * 0.2
                         else "balance+comm margins small"),
    }
    return out


def main() -> int:
    paths = sys.argv[1:] or ["artifacts/partition_stats_reddit.json",
                             "artifacts/partition_stats_reddit16x.json"]
    for path in paths:
        out = project(path)
        name = out["dataset"].replace("synth-", "")
        dst = f"artifacts/predicted_scaling_{name}.json"
        with open(dst, "w") as fh:
            json.dump(out, fh, indent=1)
        ns = out["north_star"]
        print(f"{dst}: P={ns['at_parts']} "
              f"eff(overlap)={ns['efficiency_measured_overlapped']} "
              f"eff(serial)={ns['efficiency_measured_unoverlapped']} "
              f"clears_80pct={ns['clears_80pct']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

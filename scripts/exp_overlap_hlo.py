"""Structural evidence for the halo/compute overlap claim (VERDICT r3 #2).

The sharded design splits each layer's aggregation into interior (own-block)
and boundary (halo) operators precisely so the ppermute rounds and the
interior work have no data dependence (parallel/sharded.halo_graphsum). Until
round 4 the claim "XLA overlaps them" was prose. This script produces the
evidence: it AOT-compiles the PRODUCTION fused sharded epoch program
(make_sharded_run_epochs: MXU interior tiles + Blocked2DDev residual +
offset-bucketed ppermute, pass-fused pair loop) against an UNATTACHED TPU
topology (jax.experimental.topologies — no multi-chip hardware needed, the
TPU compiler schedules for the topology) and inspects the scheduled HLO:

* async pairs: every ppermute must lower to `collective-permute-start` /
  `collective-permute-done` (the sync form would serialize);
* bracketing: between each start and its done, the schedule must place real
  interior work (the tile-contraction fusions / interior segment sums) —
  i.e. the DMA is in flight while the MXU/VPU run.

Writes artifacts/overlap_hlo_<topo>.json (verdict + counts) and
artifacts/overlap_hlo_excerpt.txt (annotated schedule excerpt around the
first overlapped start/done pair). tests/test_overlap_hlo.py pins the
committed artifact's verdict.

Usage (TPU toolchain required for the compile; ~1 min):
    python scripts/exp_overlap_hlo.py [--topology v5e-4] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_lowered(topology: str, epochs: int):
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cuda_gcn_tpu.config import GCNConfig
    from cuda_gcn_tpu.data.synthetic import SynthSpec, make_synthetic
    from cuda_gcn_tpu.parallel import sharded
    from cuda_gcn_tpu.parallel.partition import partition_graph
    from cuda_gcn_tpu import train as train_mod

    topo = topologies.get_topology_desc(topology)
    devices = np.asarray(topo.devices)
    mesh = Mesh(devices, axis_names=(sharded.GRAPH_AXIS,))
    n_parts = len(devices)

    # pubmed-profile scale with the production operators engaged (same shape
    # class as __graft_entry__.dryrun_multichip)
    spec = SynthSpec(num_nodes=19717, num_edges=44338, num_classes=3,
                     input_dim=500, nnz_per_node=8, train_per_class=60,
                     num_val=500, num_test=1000)
    ds = make_synthetic(spec, seed=0)
    cfg = ds.apply_config(GCNConfig(hidden_dim=16, graphsum_backend="bsr"))

    pg = partition_graph(ds.graph, n_parts, interior_tiles=True, bsr_tile=64,
                         bsr_min_edges=16, blocked_blk=512, blocked_min_nodes=0)
    shard = NamedSharding(mesh, P(sharded.GRAPH_AXIS))
    repl = NamedSharding(mesh, P())

    def sds(a):
        a = np.asarray(a)
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=shard)

    inputs = sharded.make_sharded_inputs(
        pg, ds.dense_features(np.dtype(cfg.compute_dtype)), mesh, put=sds)
    assert inputs.interior.tiles is not None, "production tiles must be engaged"
    assert inputs.interior.blk_fwd is not None, "Blocked2DDev must be engaged"

    state_shape = jax.eval_shape(lambda: train_mod.create_state(cfg))
    state = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl),
        state_shape)
    truth = jax.ShapeDtypeStruct((pg.padded_nodes,), np.dtype(np.int32),
                                 sharding=shard)

    run = sharded.make_sharded_run_epochs(mesh, cfg)
    return run.lower(state, inputs, truth, truth, epochs=epochs), cfg


INTERIOR_PAT = re.compile(
    r"fusion|dot\(|convolution|dynamic-slice|dynamic-update-slice|scatter|while")


def analyze_schedule(txt: str) -> dict:
    """Linear walk over the scheduled module text: TPU compiled HLO is
    printed in schedule order, and a collective-permute-done names its start
    (same computation by construction), so matching start->done by op name
    and counting real-work instructions between them measures exactly what
    the scheduler put in flight under the DMA."""
    instrs = [ln.strip() for ln in txt.splitlines()
              if ln.strip().startswith("%") and " = " in ln]
    starts: dict[str, int] = {}
    pairs = []
    for i, ins in enumerate(instrs):
        opname = ins.split(" = ")[0].strip().lstrip("%")
        if "collective-permute-start(" in ins:
            starts[opname] = i
        elif "collective-permute-done(" in ins:
            mm = re.search(r"collective-permute-done\(%?([\w.\-]+)\)", ins)
            if not mm or mm.group(1) not in starts:
                continue
            s_i = starts.pop(mm.group(1))
            between = instrs[s_i + 1: i]
            work = [b for b in between if INTERIOR_PAT.search(b)
                    and "collective-permute" not in b]
            pairs.append(dict(start_op=mm.group(1), start_index=s_i,
                              done_index=i, gap=i - s_i,
                              work_ops_between=len(work),
                              sample_work=[w.split(" = ")[0] for w in work[:4]]))
    return dict(
        n_instructions=len(instrs),
        sync_collective_permutes=len(
            [i for i in instrs
             if re.search(r"= \S+ collective-permute\(", i)]),
        n_start_done_pairs=len(pairs),
        n_overlapped_pairs=sum(1 for p in pairs if p["work_ops_between"] > 0),
        max_work_between=max((p["work_ops_between"] for p in pairs), default=0),
        pairs=pairs,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e-4")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out-prefix", default="artifacts/overlap_hlo")
    args = ap.parse_args()

    lowered, cfg = build_lowered(args.topology, args.epochs)
    compiled = lowered.compile()
    txt = compiled.as_text()
    report = analyze_schedule(txt)
    report["topology"] = args.topology
    report["halo_dtype"] = cfg.halo_dtype
    bf16_wire = len(re.findall(r"collective-permute-start\(", txt)) > 0 and \
        all("bf16" in ln or "collective-permute-done" in ln
            for ln in txt.splitlines() if "collective-permute-start(" in ln)
    report["all_start_payloads_bf16"] = bool(bf16_wire)
    verdict = (report["n_start_done_pairs"] > 0
               and report["n_overlapped_pairs"] == report["n_start_done_pairs"])
    report["overlap_verdict"] = ("OVERLAPPED" if verdict else "NOT_OVERLAPPED")

    # annotated excerpt: the schedule around the best pair
    best = max(report["pairs"], key=lambda p: p["work_ops_between"], default=None)
    excerpt_lines = []
    if best is not None:
        instrs = [ln.rstrip() for ln in txt.splitlines()
                  if ln.strip().startswith("%") and " = " in ln]
        excerpt_lines.append(
            f"# start op %{best['start_op']} — schedule positions "
            f"{best['start_index']}..{best['done_index']}, "
            f"{best['work_ops_between']} work ops in flight under the DMA")
        span = instrs[best["start_index"]: best["done_index"] + 1]
        shown = (span if len(span) <= 40
                 else span[:25] + [f"  ... {len(span) - 35} instructions elided ..."]
                 + span[-10:])
        for j, ln in enumerate(shown):
            tag = (" << START" if ln is span[0] else
                   " << DONE" if ln is span[-1] else "")
            excerpt_lines.append(ln[:240] + tag)

    summary = {k: v for k, v in report.items() if k != "pairs"}
    summary["pairs_summary"] = [
        {k: p[k] for k in ("start_op", "gap", "work_ops_between")}
        for p in report["pairs"]]
    out_json = f"{args.out_prefix}_{args.topology.replace(':', 'x')}.json"
    with open(out_json, "w") as fh:
        json.dump(summary, fh, indent=1)
    with open(f"{args.out_prefix}_excerpt.txt", "w") as fh:
        fh.write("\n".join(excerpt_lines) + "\n")
    print(json.dumps({k: summary[k] for k in
                      ("overlap_verdict", "n_start_done_pairs",
                       "n_overlapped_pairs", "max_work_between",
                       "sync_collective_permutes", "all_start_payloads_bf16")}))
    print(f"wrote {out_json} and {args.out_prefix}_excerpt.txt")
    return 0 if summary["overlap_verdict"] == "OVERLAPPED" else 2


if __name__ == "__main__":
    sys.exit(main())

"""Unit tests for the analytic multi-chip scaling projection
(scripts/predict_scaling.py — the committed evidence for the >=80% linear
edges/s north star, BASELINE.md). The projection is pure arithmetic over a
partition-stats document, so it is testable without artifacts or devices.
"""

import json
import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import predict_scaling as ps  # noqa: E402


def _stats_doc(tmp_path, results):
    doc = {"dataset": "synth-unit", "nnz": 1_000_000, "results": results}
    p = tmp_path / "stats.json"
    p.write_text(json.dumps(doc))
    return str(p)


def _part(parts, boundary, balance, hmax_k):
    return {
        "parts": parts,
        "boundary_fraction": boundary,
        "partition": {"edge_balance": balance, "hmax_k": hmax_k},
    }


def test_p1_is_exactly_the_single_chip_model(tmp_path):
    out = ps.project(_stats_doc(tmp_path, [_part(1, 0.0, 1.0, [])]))
    (r,) = out["results"]
    t1 = 1_000_000 * ps.PASSES_PER_EPOCH * ps.C_EDGE_NS_MEASURED * 1e-9
    assert r["comm_s_per_epoch"] == 0.0
    assert r["predicted_epoch_s_measured"] == pytest.approx(t1, rel=1e-6)
    assert r["efficiency_measured_overlapped"] == 1.0
    assert r["efficiency_measured_unoverlapped"] == 1.0


def test_efficiency_never_exceeds_one_and_penalizes_imbalance(tmp_path):
    # zero comm, pure imbalance: efficiency must be exactly 1/balance
    out = ps.project(_stats_doc(tmp_path, [_part(4, 0.2, 1.25, [0, 0, 0])]))
    (r,) = out["results"]
    assert r["comm_s_per_epoch"] == 0.0
    assert r["efficiency_measured_overlapped"] == pytest.approx(1 / 1.25, abs=1e-4)
    assert r["efficiency_measured_overlapped"] <= 1.0


def test_comm_model_ring_hops(tmp_path):
    # P=4, only offset-1 sections (hmax_k[0]): each round shifts by 1 hop;
    # doubling the section size must double comm seconds
    # sizes large enough that the artifact's 6-decimal rounding is noise
    d1 = ps.project(_stats_doc(tmp_path, [_part(4, 0.1, 1.0, [10_000_000, 0, 0])]))
    d2 = ps.project(_stats_doc(tmp_path, [_part(4, 0.1, 1.0, [20_000_000, 0, 0])]))
    c1 = d1["results"][0]["comm_s_per_epoch"]
    c2 = d2["results"][0]["comm_s_per_epoch"]
    assert c1 > 0
    assert c2 == pytest.approx(2 * c1, rel=1e-4)
    # the middle offset of a P=4 ring is 2 hops away: same rows cost 2x
    dmid = ps.project(_stats_doc(tmp_path, [_part(4, 0.1, 1.0, [0, 10_000_000, 0])]))
    assert dmid["results"][0]["comm_s_per_epoch"] == pytest.approx(2 * c1, rel=1e-4)


def test_overlap_bound_is_max_serial_is_sum(tmp_path):
    out = ps.project(_stats_doc(tmp_path, [_part(2, 0.5, 1.0, [10_000_000])]))
    (r,) = out["results"]
    comp = (1_000_000 / 2) * ps.PASSES_PER_EPOCH * ps.C_EDGE_NS_MEASURED * 1e-9
    comm = r["comm_s_per_epoch"]
    assert r["predicted_epoch_s_measured"] == pytest.approx(max(comp, comm), rel=1e-4)
    t1 = 1_000_000 * ps.PASSES_PER_EPOCH * ps.C_EDGE_NS_MEASURED * 1e-9
    assert r["efficiency_measured_unoverlapped"] == pytest.approx(
        t1 / (2 * (comp + comm)), abs=1e-4)


def test_north_star_verdict_uses_largest_p(tmp_path):
    out = ps.project(_stats_doc(tmp_path, [
        _part(1, 0.0, 1.0, []),
        _part(8, 0.3, 1.05, [100, 100, 100, 100, 100, 100, 100]),
    ]))
    ns = out["north_star"]
    assert ns["at_parts"] == 8
    assert ns["target"] == 0.80
    top = [r for r in out["results"] if r["parts"] == 8][0]
    expect = min(top["efficiency_measured_overlapped"],
                 top["efficiency_measured_unoverlapped"]) >= 0.80
    assert ns["clears_80pct"] == expect


def test_committed_artifacts_are_consistent_with_the_model():
    """The committed predicted_scaling artifacts must be reproducible from the
    committed partition stats (guards against stale evidence after model or
    stats changes)."""
    art = Path(__file__).resolve().parent.parent / "artifacts"
    for name in ("reddit", "reddit16x", "reddit32x"):
        stats = art / f"partition_stats_{name}.json"
        pred = art / f"predicted_scaling_{name}.json"
        if not (stats.exists() and pred.exists()):
            continue
        fresh = ps.project(str(stats))
        committed = json.loads(pred.read_text())
        assert committed["nnz"] == fresh["nnz"]
        for rc, rf in zip(committed["results"], fresh["results"]):
            assert rc["parts"] == rf["parts"]
            assert math.isclose(rc["efficiency_measured_overlapped"],
                                rf["efficiency_measured_overlapped"],
                                abs_tol=1e-4)

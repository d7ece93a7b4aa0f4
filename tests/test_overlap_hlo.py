"""Pins the halo/compute overlap evidence (VERDICT r3 directive #2).

The claim "XLA overlaps the ppermute rounds with the interior aggregation"
(parallel/sharded.halo_graphsum) is backed by a committed artifact produced
by scripts/exp_overlap_hlo.py: the PRODUCTION fused sharded epoch program is
AOT-compiled against an unattached v5e-4 TPU topology and its scheduled HLO
inspected. These tests (a) pin the committed artifact's verdict so the claim
can never silently rot into prose again, and (b) unit-test the schedule
analyzer itself on synthetic HLO text so the artifact's meaning is itself
tested.
"""

import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))

from exp_overlap_hlo import analyze_schedule  # noqa: E402

ARTIFACT = ROOT / "artifacts" / "overlap_hlo_v5e-4.json"


def test_committed_overlap_artifact_verdict():
    assert ARTIFACT.exists(), (
        "overlap evidence artifact missing — regenerate with "
        "`python scripts/exp_overlap_hlo.py` (needs the TPU compiler)")
    doc = json.loads(ARTIFACT.read_text())
    assert doc["overlap_verdict"] == "OVERLAPPED"
    assert doc["n_start_done_pairs"] > 0
    # EVERY ppermute is async (no sync collective-permute survived scheduling)
    assert doc["sync_collective_permutes"] == 0
    # every start/done pair has real work scheduled in flight under the DMA
    assert doc["n_overlapped_pairs"] == doc["n_start_done_pairs"]
    assert doc["max_work_between"] >= 10
    # the wire format on the REAL TPU backend is bf16 (the CPU backend
    # legalizes bf16 collectives to f32, so the lowered-HLO test in
    # test_parallel.py alone would not prove the compiled program ships bf16)
    assert doc["halo_dtype"] == "bfloat16"
    assert doc["all_start_payloads_bf16"] is True


_FAKE_OVERLAPPED = """
  %collective-permute-start.1 = (bf16[8,2]{1,0}) collective-permute-start(%p0)
  %fusion.1 = bf16[8,2]{1,0} fusion(%p1), kind=kLoop
  %dot.1 = f32[8,8]{1,0} dot(%p1, %p2)
  %collective-permute-done.1 = bf16[8,2]{1,0} collective-permute-done(%collective-permute-start.1)
"""

_FAKE_SERIAL = """
  %collective-permute-start.1 = (bf16[8,2]{1,0}) collective-permute-start(%p0)
  %collective-permute-done.1 = bf16[8,2]{1,0} collective-permute-done(%collective-permute-start.1)
  %fusion.1 = bf16[8,2]{1,0} fusion(%p1), kind=kLoop
"""

_FAKE_SYNC = """
  %cp.1 = bf16[8,2]{1,0} collective-permute(%p0)
  %fusion.1 = bf16[8,2]{1,0} fusion(%p1), kind=kLoop
"""


def test_analyzer_detects_overlap():
    r = analyze_schedule(_FAKE_OVERLAPPED)
    assert r["n_start_done_pairs"] == 1
    assert r["n_overlapped_pairs"] == 1
    assert r["max_work_between"] == 2
    assert r["sync_collective_permutes"] == 0


def test_analyzer_detects_serialization():
    r = analyze_schedule(_FAKE_SERIAL)
    assert r["n_start_done_pairs"] == 1
    assert r["n_overlapped_pairs"] == 0  # nothing in flight: would fail CI


def test_analyzer_counts_sync_permutes():
    r = analyze_schedule(_FAKE_SYNC)
    assert r["n_start_done_pairs"] == 0
    assert r["sync_collective_permutes"] == 1

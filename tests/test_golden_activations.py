"""Cross-binary golden-activation parity (SURVEY §4 item 2).

Runs scripts/golden_activations.py end-to-end: builds the reference gcn-seq
from /root/reference in a scratch copy with our deterministic-weight driver,
dumps eval-mode per-module activations, and asserts the framework's production
ops reproduce each stage to f32 rounding. This is the check that the oracle
(tests/oracle.py) and the framework don't share a misreading of
src/seq/module.cpp — the comparison target here is the compiled binary itself.

Skipped when the reference tree or a C++ toolchain is unavailable.
"""

import os
import shutil
import subprocess

import pytest

REFERENCE = "/root/reference"


def _have_toolchain() -> bool:
    if shutil.which("g++") is None or shutil.which("make") is None:
        return False
    return os.path.isfile(os.path.join(REFERENCE, "src", "seq", "gcn.cpp"))


@pytest.mark.skipif(not _have_toolchain(),
                    reason="needs /root/reference and g++/make")
def test_golden_activations_match_reference_binary(tmp_path):
    from scripts.golden_activations import run_golden

    out = run_golden("synth-cora", REFERENCE, out_json=None)
    assert out["verdict"] == "ok", out
    # forward chain AND the round-5 backward chain (jax.grad over production
    # ops vs the reference's module-by-module backward) must both be present
    assert {"xw", "g1", "relu", "hw", "logits", "loss",
            "d_logits", "d_g1", "d_xw", "d_w1", "d_w2"} <= set(out["stages"])
    for name, stage in out["stages"].items():
        assert stage["ok"], (name, stage)
        assert stage["max_rel_err"] <= 2e-5


def test_committed_golden_artifacts_are_ok():
    """Both committed cross-binary golden artifacts (cora + pubmed scale)
    must carry an ok verdict with every forward AND gradient stage present —
    a regenerated artifact that silently drops the backward chain fails
    here."""
    import json
    from pathlib import Path

    art = Path(__file__).resolve().parent.parent / "artifacts"
    need = {"xw", "g1", "relu", "hw", "logits", "loss",
            "d_logits", "d_g1", "d_xw", "d_w1", "d_w2"}
    for name in ("golden_activations.json", "golden_activations_pubmed.json",
                 "golden_activations_citeseer.json"):
        doc = json.loads((art / name).read_text())
        assert doc["verdict"] == "ok", (name, doc)
        assert need <= set(doc["stages"]), (name, sorted(doc["stages"]))
        for st, row in doc["stages"].items():
            assert row["ok"] and row["max_rel_err"] <= 2e-5, (name, st, row)


@pytest.mark.skipif(not _have_toolchain(),
                    reason="needs /root/reference and g++/make")
def test_golden_build_fails_loudly_on_missing_weights(tmp_path):
    """The driver must exit nonzero (not silently glorot-init) when the weight
    files are absent — guards the injection path itself."""
    from scripts.golden_activations import build_golden

    binary = build_golden(REFERENCE, str(tmp_path))
    r = subprocess.run([binary, "nonexistent", str(tmp_path), str(tmp_path)],
                       cwd=str(tmp_path), capture_output=True, text=True)
    assert r.returncode != 0

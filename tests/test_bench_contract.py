"""Driver contract for bench.py (VERDICT r4 #6): ONE JSON line on stdout,
exit 0, even when the run fails — the round-4 tile-engine regression crashed
the compile and zeroed the round's bench; the contract now degrades instead.
These tests exercise the wrapper in-process with a stubbed run_bench, so the
retry-on-xla-engine and the error-result shape are pinned without a chip.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import importlib  # noqa: E402

import bench  # noqa: E402

# the ops package re-export shadows the submodule attribute, so plain import
# forms return the op FUNCTION — the module must come from sys.modules
graphsum = importlib.import_module("cuda_gcn_tpu.ops.graphsum")


def _run_main(monkeypatch, capsys, argv=("bench.py",)):
    monkeypatch.setattr(sys, "argv", list(argv))
    rc = bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out  # exactly ONE line on stdout
    return rc, json.loads(out[0])


def test_one_json_line_and_rc0_when_every_attempt_fails(monkeypatch, capsys):
    def boom(args):
        raise RuntimeError("synthetic engine failure")

    monkeypatch.setattr(bench, "run_bench", boom)
    monkeypatch.setattr(graphsum, "_TILE_ENGINE", "auto")
    rc, doc = _run_main(monkeypatch, capsys)
    assert rc == 0
    assert doc["value"] is None and doc["vs_baseline"] is None
    assert "synthetic engine failure" in doc["detail"]["error"]
    assert "synthetic engine failure" in doc["detail"]["fallback_reason"]
    assert doc["metric"].endswith("_train_time")


def test_first_failure_retries_on_the_xla_engine(monkeypatch, capsys):
    calls = []

    def flaky(args):
        calls.append(graphsum._TILE_ENGINE)
        if len(calls) == 1:
            raise RuntimeError("mosaic rejected")
        return {"metric": "m", "value": 1.0, "unit": "s", "vs_baseline": 2.0}

    monkeypatch.setattr(bench, "run_bench", flaky)
    monkeypatch.setattr(graphsum, "_TILE_ENGINE", "auto")
    rc, doc = _run_main(monkeypatch, capsys)
    assert rc == 0
    assert calls == ["auto", "xla"]  # retried once, pinned to the XLA engine
    assert doc["value"] == 1.0
    assert "mosaic rejected" in doc["detail"]["fallback_reason"]


def test_no_retry_when_already_on_xla(monkeypatch, capsys):
    calls = []

    def boom(args):
        calls.append(1)
        raise RuntimeError("xla path failed")

    monkeypatch.setattr(bench, "run_bench", boom)
    monkeypatch.setattr(graphsum, "_TILE_ENGINE", "xla")
    rc, doc = _run_main(monkeypatch, capsys)
    assert rc == 0 and len(calls) == 1
    assert doc["value"] is None

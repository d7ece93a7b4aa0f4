"""CI-side TPU-compile coverage for the Pallas BSR kernels (VERDICT r4 #2).

All other Pallas tests run interpret mode on CPU, which can never catch a
Mosaic/TPU compile failure — the class that took down the round-4 driver bench
(BENCH_r04.json: gate passed, compiler rejected an 85.75 MiB scoped-vmem
allocation at reddit dims). scripts/aot_compile_bsr.py compiles the real
kernels at the real dims against an unattached TPU topology (no chip needed,
same mechanism as scripts/exp_overlap_hlo.py); this test runs it in a
subprocess (the suite's conftest pins this process to CPU) and asserts the
auto-gate's selection compiles at every live feature width.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "aot_compile_bsr.py"


@pytest.mark.slow
def test_bsr_kernels_compile_on_tpu_at_reddit_dims():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the script needs the TPU plugin visible
    proc = subprocess.run([sys.executable, str(SCRIPT), "--dims", "reddit"],
                          capture_output=True, text=True, timeout=900, env=env)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    report = json.loads(line)
    if proc.returncode == 3:
        pytest.skip(f"no TPU compile toolchain: {report.get('error')}")
    assert proc.returncode == 0, (
        f"gate-selected Pallas variant fails to compile at reddit dims "
        f"(the BENCH_r04 regression class): {line}\n{proc.stderr[-2000:]}")
    assert report["all_gate_selections_compile"]
    # both live fused-pair widths must have a compiling gate selection
    for d in ("32", "82"):
        assert report["widths"][d]["selected_compiles"], report["widths"][d]

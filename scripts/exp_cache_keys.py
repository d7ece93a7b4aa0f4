"""Do prime_cache's AOT keys match the jit path's persistent-cache keys?

The round-5 prime-cache cycle on the chip (artifacts/prime_cache_cycle.json)
shows the primed bench run MISSING the entries `train.prime_cache` just
wrote (entries 2 -> 4, cache_hit false). Two candidate causes:

  (a) ours — `.lower().compile()` produces different cache keys than the
      jit dispatch path, so priming can never hit;
  (b) environmental — the axon backend hashes an accelerator fingerprint
      that drifts across tunnel-worker sessions (docs/PERF.md "Compile
      time" observed a same-process-type miss 19 minutes after a cold run).

This discriminates them ON CPU, where there is no fingerprint drift: leg 1
primes synth-cora into a fresh cache dir in one subprocess; leg 2 runs the
same config via the production `train.run` in a second subprocess and
counts new entries. Zero new entries => our keys match and the chip miss is
(b). Run: python scripts/exp_cache_keys.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

LEG = r"""
import sys, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from cuda_gcn_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache({cache!r})
from cuda_gcn_tpu.config import GCNConfig
from cuda_gcn_tpu.data.synthetic import make_synthetic
from cuda_gcn_tpu import train
ds = make_synthetic("synth-cora", seed=0)
cfg = GCNConfig(epochs=60, seed=0)
if {prime!r} == "prime":
    train.prime_cache(cfg, ds, verbose=True)
else:
    r = train.run(cfg, ds, verbose=False)
    print("test_acc", r.test_acc)
"""


def entries(d: str) -> set[str]:
    return {p.name for p in Path(d).rglob("*") if p.is_file()}


def run_leg(kind: str, cache: str) -> None:
    code = LEG.format(repo=str(REPO), cache=cache, prime=kind)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=1200, env=env, cwd=REPO)
    if proc.returncode != 0:
        raise RuntimeError(f"{kind} leg failed:\n{proc.stderr[-3000:]}")
    print(f"[{kind}] {proc.stdout.strip()}", file=sys.stderr)


def main() -> int:
    # optional out path (argv[1]); CI passes a temp file so suite runs don't
    # mutate the committed evidence artifact
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "artifacts" / "cache_keys_cpu.json")
    work = tempfile.mkdtemp(prefix="xla_cache_keys_")
    run_leg("prime", work)
    primed = entries(work)
    run_leg("run", work)
    after = entries(work)
    new = sorted(after - primed)
    report = {
        "platform": "cpu",
        "entries_after_prime": len(primed),
        "entries_after_run": len(after),
        "new_entries_from_run": new,
        "aot_keys_match_jit_keys": not new,
    }
    print(json.dumps(report, indent=1))
    out.write_text(json.dumps(report, indent=1))
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

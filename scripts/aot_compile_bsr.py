"""Chip-free TPU-compile check for the Pallas BSR tile-contraction kernels
(ops/pallas_bsr.py) at flagship dims — VERDICT round-4 directive #2.

Round 4 shipped a kernel whose budget gate passed at reddit dims while the
Mosaic/XLA compiler rejected it against the 16 MiB scoped-vmem limit; every
interpret-mode test stayed green and the driver bench crashed (BENCH_r04.json).
Interpret mode can never catch a Mosaic compile failure — but the TPU compiler
can run WITHOUT a chip: like scripts/exp_overlap_hlo.py, this AOT-compiles
against an unattached TPU topology (jax.experimental.topologies), so CI fails
before a driver run ever does.

For every requested feature width it compiles BOTH kernel variants and asserts
the auto-gate's selection (pallas_bsr.select_variant) is among the compilable
ones. Prints ONE JSON line; exit codes: 0 = every gate selection compiles,
1 = some gate selection does not (the round-4 bug class), 3 = no TPU compile
toolchain available (callers should skip).

Run standalone (no chip needed, ~1 min):
    python scripts/aot_compile_bsr.py --dims reddit
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# must win over any inherited CPU pin before jax is imported
os.environ.pop("JAX_PLATFORMS", None)

# reddit bench dims (bench.py --dataset reddit: LPA-reordered bsr graph,
# artifacts/op_timing_reddit.json): 21,946 [256,256] bf16 tiles over 911 block
# rows; live activation widths = fused pair widths 2*16 / 2*41 plus the
# train-width backward / trailing-eval widths 16 / 41 (train.run_epochs).
DIMS = {
    "reddit": dict(k=21946, tb=256, t_blocks=911, widths=(16, 32, 41, 82)),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="reddit", choices=sorted(DIMS))
    ap.add_argument("--topology", default="v5e-4")
    ap.add_argument("--h-dtype", default="float32")
    ap.add_argument("--tile-dtype", default="bfloat16")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    try:
        from jax.experimental import topologies
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        topo = topologies.get_topology_desc(args.topology)
    except Exception as e:  # no TPU plugin/compile service: skip, don't fail
        print(json.dumps({"status": "no_tpu_toolchain", "error": str(e)[:400]}))
        return 3

    from cuda_gcn_tpu.ops import pallas_bsr

    mesh = Mesh(np.asarray(topo.devices)[:1].reshape(1), axis_names=("x",))
    repl = NamedSharding(mesh, P())
    dims = DIMS[args.dims]
    k, tb, t_blocks = dims["k"], dims["tb"], dims["t_blocks"]
    h_dtype, tile_dtype = jnp.dtype(args.h_dtype), jnp.dtype(args.tile_dtype)

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt, sharding=repl)

    def compile_variant(variant: str, dp: int):
        call = (pallas_bsr._bsr_pallas_call_resident if variant == "resident"
                else pallas_bsr._bsr_pallas_call)
        a = (sds((k,), jnp.int32), sds((k,), jnp.int32),
             sds((k, tb, tb), tile_dtype), sds((t_blocks, dp, tb), h_dtype),
             sds((t_blocks, dp, tb), jnp.float32))
        t0 = time.time()
        try:
            jax.jit(functools.partial(call, interpret=False)).lower(*a).compile()
            return {"ok": True, "seconds": round(time.time() - t0, 1)}
        except Exception as e:
            return {"ok": False, "seconds": round(time.time() - t0, 1),
                    "error": str(e)[:400]}

    report = {"status": "ok", "dims": args.dims, "topology": args.topology,
              "k": k, "tb": tb, "t_blocks": t_blocks,
              "h_dtype": str(h_dtype), "tile_dtype": str(tile_dtype),
              "widths": {}}
    all_selected_ok = True
    for d in dims["widths"]:
        dp = pallas_bsr.padded_width(d)
        selected = pallas_bsr.preferred_variant(k, tb, t_blocks, dp,
                                                h_dtype.itemsize,
                                                tile_dtype.itemsize)
        row = {"dp": dp, "gate_selected": selected}
        for variant in ("resident", "blocked"):
            row[variant] = compile_variant(variant, dp)
        # 'xla' needs no Pallas compile; otherwise the policy's pick must build
        row["selected_compiles"] = (selected == "xla"
                                    or bool(row[selected]["ok"]))
        all_selected_ok = all_selected_ok and row["selected_compiles"]
        report["widths"][str(d)] = row
    report["all_gate_selections_compile"] = all_selected_ok
    print(json.dumps(report))
    return 0 if all_selected_ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Find the shape envelope where Mosaic's dynamic_gather actually compiles."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    def try_taa(s, l, axis, dt=jnp.float32, steps=32):
        tab = jnp.asarray(rng.standard_normal((s, l)), dt)
        hi = s if axis == 0 else l
        idx = jnp.asarray(rng.integers(0, hi, size=(s, l), dtype=np.int32))

        def k(idx_ref, tab_ref, out_ref):
            tabv = tab_ref[:]
            idxv = idx_ref[:]

            def body(_, acc):
                return acc + jnp.take_along_axis(tabv, idxv, axis=axis).astype(jnp.float32)

            out_ref[:] = jax.lax.fori_loop(0, steps, body,
                                           jnp.zeros((s, l), jnp.float32))

        f = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, l), jnp.float32),
        )
        g = jax.jit(lambda i, t: jnp.sum(f(i, t)))
        try:
            float(g(idx, tab))
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                float(g(idx, tab))
            ms = (time.perf_counter() - t0) / n * 1000
            per = ms * 1e6 / (s * l * steps)
            print(f"OK   TAA axis{axis} [{s}x{l}] {jnp.dtype(dt).name} x{steps}: "
                  f"{ms:.2f} ms -> {per:.4f} ns/elem", flush=True)
        except Exception as e:
            print(f"FAIL TAA axis{axis} [{s}x{l}] {jnp.dtype(dt).name}: "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:120]}", flush=True)

    for s in (8, 32, 256, 1024):
        try_taa(s, 128, 0)
    try_taa(8, 512, 0)
    try_taa(8, 128, 1)
    try_taa(32, 2048, 1)


if __name__ == "__main__":
    main()

"""Bisect which dynamic_gather kernel forms Mosaic accepts on this toolchain."""

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

    print(f"device={jax.devices()[0]} jax={jax.__version__}", flush=True)
    rng = np.random.default_rng(0)

    def try_case(name, kernel, inputs, out_sd):
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_sd,
        )
        g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
        try:
            t0 = time.perf_counter()
            r = float(g(*inputs))
            dt_c = time.perf_counter() - t0
            # quick timing
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                float(g(*inputs))
            ms = (time.perf_counter() - t0) / n * 1000
            print(f"OK   {name}: compile {dt_c:.1f}s, {ms:.2f} ms/call", flush=True)
            return ms
        except Exception as e:
            msg = str(e).split("\n")[0][:150]
            print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
            return None

    S, L = 8192, 128
    tab = jnp.asarray(rng.standard_normal((S, L)), jnp.float32)
    idx_full = jnp.asarray(rng.integers(0, S, size=(S, L), dtype=np.int32))
    idx_col = jnp.asarray(rng.integers(0, S, size=(S, 1), dtype=np.int32))

    # 1. single take_along_axis, full idx passed in
    def k1(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    try_case("single TAA axis0, full idx", k1, (idx_full, tab),
             jax.ShapeDtypeStruct((S, L), jnp.float32))

    # 2. single take_along_axis, idx broadcast in kernel
    def k2(idx_ref, tab_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[:], (S, L))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=0)

    try_case("single TAA axis0, bcast idx [S,1]", k2, (idx_col, tab),
             jax.ShapeDtypeStruct((S, L), jnp.float32))

    # 3. loop of 64 TAAs, full idx per step from a [S, 64] compact array
    steps = 64
    idx_steps = jnp.asarray(rng.integers(0, S, size=(S, steps), dtype=np.int32))

    def k3(idx_ref, tab_ref, out_ref):
        tabv = tab_ref[:]

        def body(k, acc):
            idx = jnp.broadcast_to(idx_ref[:, k][:, None], (S, L))
            return acc + jnp.take_along_axis(tabv, idx, axis=0)

        out_ref[:] = jax.lax.fori_loop(0, steps, body, jnp.zeros((S, L), jnp.float32))

    ms = try_case(f"fori x{steps} TAA axis0", k3, (idx_steps, tab),
                  jax.ShapeDtypeStruct((S, L), jnp.float32))
    if ms:
        rows = S * steps
        print(f"     -> {ms * 1e6 / rows:.3f} ns/row, {rows * L * 4 / ms / 1e6:.0f} GB/s",
              flush=True)

    # 4. axis=1 (lane gather), full idx
    S2, L2 = 16, 8192
    tab2 = jnp.asarray(rng.standard_normal((S2, L2)), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, L2, size=(S2, L2), dtype=np.int32))

    def k4(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    try_case("single TAA axis1 [16x8192]", k4, (idx2, tab2),
             jax.ShapeDtypeStruct((S2, L2), jnp.float32))

    # 5. plain jnp.take (the old kernel's form) for reference
    idx1d = jnp.asarray(rng.integers(0, S, size=(S,), dtype=np.int32))

    def k5(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    try_case("jnp.take axis0 idx[S]", k5, (idx1d, tab),
             jax.ShapeDtypeStruct((S, L), jnp.float32))


if __name__ == "__main__":
    main()

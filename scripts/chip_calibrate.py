"""Raw-capability calibration of the live device: dispatch overhead, matmul
FLOPs, HBM stream bandwidth, gather throughput, VMEM capacity probe.

These numbers anchor the speed-of-light model in utils/profiling.py and decide
which graphsum layout can win. Run on the real chip.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, iters=8, warmup=3):
    import numpy as np
    for _ in range(warmup):
        r = fn(*args)
    float(np.asarray(r).ravel()[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)
    try:
        print(f"memory_stats: {dev.memory_stats()}", flush=True)
    except Exception as e:
        print(f"memory_stats unavailable: {e}", flush=True)

    key = jax.random.PRNGKey(0)

    # dispatch overhead: trivial program
    triv = jax.jit(lambda s: s + 1.0)
    t = timeit(triv, jnp.float32(0.0), iters=20)
    print(f"dispatch overhead (trivial jit): {t * 1000:.2f} ms", flush=True)

    # matmul FLOPs, fp32 and bf16
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        a = jax.random.normal(key, (8192, 8192), dt)
        b = jax.random.normal(key, (8192, 8192), dt)
        mm = jax.jit(lambda x, y: jnp.sum(
            jnp.dot(x, y, preferred_element_type=jnp.float32)))
        sec = timeit(mm, a, b)
        fl = 2 * 8192**3
        print(f"matmul 8192^3 {name}: {sec * 1000:.2f} ms -> {fl / sec / 1e12:.1f} TFLOP/s",
              flush=True)

    # HBM stream: big elementwise (read+write 2GB)
    big = jax.random.normal(key, (256 * 1024 * 1024,), jnp.float32)  # 1 GB
    ew = jax.jit(lambda x: (x * 1.0001).sum())  # read 1GB (sum fuses; no write)
    sec = timeit(ew, big)
    print(f"stream read 1GB: {sec * 1000:.2f} ms -> {1.0 / sec:.0f} GB/s", flush=True)
    ew2 = jax.jit(lambda x: x * 1.0001)  # read+write
    sec = timeit(ew2, big)
    print(f"stream read+write 1GB+1GB: {sec * 1000:.2f} ms -> {2.0 / sec:.0f} GB/s", flush=True)

    # gather throughput vs table width: 16M random row gathers
    import numpy as np
    rng = np.random.default_rng(0)
    m = 1 << 24
    for n_rows, width in ((1 << 18, 16), (1 << 18, 41), (1 << 18, 128), (1 << 14, 16)):
        tab = jax.random.normal(key, (n_rows, width), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n_rows, size=m, dtype=np.int32))
        g = jax.jit(lambda t, i: jnp.sum(t[i], dtype=jnp.float32))
        sec = timeit(g, tab, idx)
        per = sec / m * 1e9
        print(f"gather {m / 1e6:.0f}M rows from [{n_rows}x{width}] f32: {sec * 1000:.2f} ms "
              f"-> {per:.2f} ns/row, {m * width * 4 / sec / 1e9:.1f} GB/s useful", flush=True)

    # segment-sum (sorted) throughput: the graphsum inner loop shape
    nseg = 232965
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, nseg, size=m, dtype=np.int32)))
    vals = jax.random.normal(key, (m, 16), jnp.float32)
    ss = jax.jit(lambda v, i: jnp.sum(jax.ops.segment_sum(
        v, i, num_segments=nseg, indices_are_sorted=True)))
    sec = timeit(ss, vals, idx_sorted)
    print(f"sorted segment_sum {m / 1e6:.0f}M x16 -> {nseg} segs: {sec * 1000:.2f} ms "
          f"({sec / m * 1e9:.2f} ns/row)", flush=True)

    # unsorted scatter-add comparison
    idx_un = jnp.asarray(rng.integers(0, nseg, size=m, dtype=np.int32))
    su = jax.jit(lambda v, i: jnp.sum(jax.ops.segment_sum(
        v, i, num_segments=nseg, indices_are_sorted=False)))
    sec = timeit(su, vals, idx_un)
    print(f"unsorted segment_sum: {sec * 1000:.2f} ms ({sec / m * 1e9:.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()

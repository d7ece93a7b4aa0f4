"""Follow-up to exp_blockgather.py: shave the segment-side overhead of the
col-blocked residual. exp1 measured (live chip, 16.7M edges, [2^18,16] table):

  flat gather 12.1 ns/row | blocked gather 4.0 ns/row   (the 3x win is real)
  flat residual 16.0 ns/edge | blocked residual 11.95 ns/edge

so the blocked segment-side costs ~7.9 ns/edge vs 3.9 flat. Suspects: the
[cap,16] vals intermediate materializing lane-padded (512 B/edge) per block,
the per-block full-[N,16] segment output, the part.T transpose. Variants here:

  C2  blocked, carry [N,16] f32, no transpose
  C14 blocked, vals bf16 (halve any materialized traffic), f32 carry via .astype
  C21 C2 + bf16 vals
  C19 flat gather with PRE-SORTED indices (does sortedness alone fix latency?)
  C24 blocked, segment per block into [N,16] bf16 parts, sum f32 at end
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
    import numpy as np

    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    n_rows, width = 1 << 18, 16
    m = 1 << 24
    nblk = 16
    blk = n_rows // nblk

    tab = jax.random.normal(key, (n_rows, width), jnp.float32)
    idx = rng.integers(0, n_rows, size=m, dtype=np.int32)
    rows = np.sort(rng.integers(0, n_rows, size=m, dtype=np.int32))
    coef = rng.random(m, dtype=np.float32)

    # C19: flat gather, sorted indices
    g = jax.jit(lambda t, i: jnp.sum(t[i], dtype=jnp.float32))
    sec = timeit(g, tab, jnp.asarray(np.sort(idx)))
    print(f"C19 flat gather SORTED idx: {sec*1e3:.2f} ms -> {sec/m*1e9:.2f} ns/row",
          flush=True)

    # shared bucketing by col-block, rows sorted within bucket
    okey = np.lexsort((rows, idx // blk))
    cb = np.bincount(idx // blk, minlength=nblk)
    cap = -(-int(cb.max()) // 1024) * 1024
    stb = np.concatenate([[0], np.cumsum(cb)])
    brows = np.full((nblk, cap), n_rows - 1, dtype=np.int32)
    bcols = np.zeros((nblk, cap), dtype=np.int32)
    bcoef = np.zeros((nblk, cap), dtype=np.float32)
    for b in range(nblk):
        sl = okey[stb[b]:stb[b + 1]]
        k = len(sl)
        brows[b, :k] = rows[sl]
        bcols[b, :k] = idx[sl] - b * blk
        bcoef[b, :k] = coef[sl]
    brows_j, bcols_j, bcoef_j = map(jnp.asarray, (brows, bcols, bcoef))

    def run(name, fn):
        sec = timeit(jax.jit(fn), tab, brows_j, bcols_j, bcoef_j)
        print(f"{name}: {sec*1e3:.2f} ms -> {sec/m*1e9:.2f} ns/edge", flush=True)

    def c2(t, br, bc, bw):
        tb = t.reshape(nblk, blk, width)

        def step(acc, xs):
            sub, r, c, w = xs
            vals = sub[c] * w[:, None]
            part = jax.ops.segment_sum(vals, r, num_segments=n_rows,
                                       indices_are_sorted=True)
            return acc + part, None

        acc, _ = jax.lax.scan(step, jnp.zeros((n_rows, width), jnp.float32),
                              (tb, br, bc, bw))
        return jnp.sum(acc, dtype=jnp.float32)

    run("C2  blocked carry[N,16] f32 ", c2)

    def c14(t, br, bc, bw):
        tb = t.reshape(nblk, blk, width).astype(jnp.bfloat16)

        def step(acc, xs):
            sub, r, c, w = xs
            vals = sub[c] * w[:, None].astype(jnp.bfloat16)
            part = jax.ops.segment_sum(vals.astype(jnp.float32), r,
                                       num_segments=n_rows, indices_are_sorted=True)
            return acc + part.T, None

        acc, _ = jax.lax.scan(step, jnp.zeros((width, n_rows), jnp.float32),
                              (tb, br, bc, bw))
        return jnp.sum(acc, dtype=jnp.float32)

    run("C14 blocked bf16 vals, carry[16,N]", c14)

    def c21(t, br, bc, bw):
        tb = t.reshape(nblk, blk, width).astype(jnp.bfloat16)

        def step(acc, xs):
            sub, r, c, w = xs
            vals = sub[c] * w[:, None].astype(jnp.bfloat16)
            part = jax.ops.segment_sum(vals.astype(jnp.float32), r,
                                       num_segments=n_rows, indices_are_sorted=True)
            return acc + part, None

        acc, _ = jax.lax.scan(step, jnp.zeros((n_rows, width), jnp.float32),
                              (tb, br, bc, bw))
        return jnp.sum(acc, dtype=jnp.float32)

    run("C21 blocked bf16 vals, carry[N,16]", c21)

    def c24(t, br, bc, bw):
        tb = t.reshape(nblk, blk, width)

        def step(_, xs):
            sub, r, c, w = xs
            vals = sub[c] * w[:, None]
            part = jax.ops.segment_sum(vals, r, num_segments=n_rows,
                                       indices_are_sorted=True)
            return None, part.astype(jnp.bfloat16)

        _, parts = jax.lax.scan(step, None, (tb, br, bc, bw))
        return jnp.sum(parts.astype(jnp.float32), dtype=jnp.float32)

    run("C24 blocked parts stacked bf16   ", c24)


if __name__ == "__main__":
    main()

"""Experiment: can a col-blocked (two-level) gather beat the flat HBM gather?

chip_calibrate.py measured random row gathers at 12.3 ns/row from a [2^18, 16]
table but 4.1 ns/row from a [2^14, 16] table (8 MB lane-padded).  If that holds
for *slices* of a big table inside a lax.scan, the BSR residual path — the
dominant cost of the reddit epoch (docs/PERF.md) — can bucket its edges by
dst-block and gather each bucket from an 8 MB sub-table at ~3x the speed.

Measures, on the live chip:
  A. flat gather baseline (16M rows, [2^18,16] table)
  B. blocked gather: same 16M indices sorted into 16 blocks of 2^14 rows,
     lax.scan over blocks, gather from the sliced sub-table
  C. blocked residual aggregation: gather*coef + segment_sum by (sorted) row,
     accumulated across blocks, vs the flat sorted-segment path
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

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    n_rows, width = 1 << 18, 16
    m = 1 << 24
    nblk = 16
    blk = n_rows // nblk  # 2^14 rows -> 8 MB lane-padded

    tab = jax.random.normal(key, (n_rows, width), jnp.float32)
    idx = rng.integers(0, n_rows, size=m, dtype=np.int32)

    # A. flat baseline
    g = jax.jit(lambda t, i: jnp.sum(t[i], dtype=jnp.float32))
    sec = timeit(g, tab, jnp.asarray(idx))
    print(f"A flat gather: {sec*1e3:.2f} ms -> {sec/m*1e9:.2f} ns/row", flush=True)

    # B. blocked gather: sort indices by block, pad buckets to equal size
    order = np.argsort(idx // blk, kind="stable")
    sidx = idx[order]
    counts = np.bincount(idx // blk, minlength=nblk)
    cap = int(counts.max())
    cap = -(-cap // 1024) * 1024
    bidx = np.zeros((nblk, cap), dtype=np.int32)  # local indices, pad -> 0
    starts = np.concatenate([[0], np.cumsum(counts)])
    for b in range(nblk):
        seg = sidx[starts[b]:starts[b + 1]] - b * blk
        bidx[b, :len(seg)] = seg
    pad_frac = nblk * cap / m - 1.0
    print(f"   buckets: cap={cap} pad={pad_frac*100:.1f}%", flush=True)

    def blocked(t, bi):
        tb = t.reshape(nblk, blk, width)

        def step(acc, xs):
            sub, i = xs
            return acc + jnp.sum(sub[i], dtype=jnp.float32), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), (tb, bi))
        return acc

    jb = jax.jit(blocked)
    sec = timeit(jb, tab, jnp.asarray(bidx))
    print(f"B blocked gather ({nblk}x{blk}): {sec*1e3:.2f} ms -> {sec/m*1e9:.2f} ns/row",
          flush=True)

    # B2: fewer, bigger blocks (4 x 2^16 = 32 MB slices)
    for nb2 in (4, 8, 32):
        blk2 = n_rows // nb2
        order2 = np.argsort(idx // blk2, kind="stable")
        sidx2 = idx[order2]
        counts2 = np.bincount(idx // blk2, minlength=nb2)
        cap2 = -(-int(counts2.max()) // 1024) * 1024
        bidx2 = np.zeros((nb2, cap2), dtype=np.int32)
        st2 = np.concatenate([[0], np.cumsum(counts2)])
        for b in range(nb2):
            seg = sidx2[st2[b]:st2[b + 1]] - b * blk2
            bidx2[b, :len(seg)] = seg

        def blocked2(t, bi, nb=nb2, bk=blk2):
            tb = t.reshape(nb, bk, width)

            def step(acc, xs):
                sub, i = xs
                return acc + jnp.sum(sub[i], dtype=jnp.float32), None

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), (tb, bi))
            return acc

        sec = timeit(jax.jit(blocked2), tab, jnp.asarray(bidx2))
        print(f"B blocked gather ({nb2}x{blk2}): {sec*1e3:.2f} ms -> {sec/m*1e9:.2f} ns/row",
              flush=True)

    # C. realistic residual: out[row] += coef * tab[col]; rows sorted within the
    # flat layout; for the blocked layout rows stay sorted within each bucket and
    # partial outputs accumulate in a [width, n_rows] (transposed, unpadded) carry.
    rows = np.sort(rng.integers(0, n_rows, size=m, dtype=np.int32))
    coef = rng.random(m, dtype=np.float32)

    def flat_resid(t, r, c, w):
        vals = t[c] * w[:, None]
        out = jax.ops.segment_sum(vals, r, num_segments=n_rows, indices_are_sorted=True)
        return jnp.sum(out, dtype=jnp.float32)

    sec = timeit(jax.jit(flat_resid), tab, jnp.asarray(rows), jnp.asarray(idx),
                 jnp.asarray(coef))
    print(f"C flat residual: {sec*1e3:.2f} ms -> {sec/m*1e9:.2f} ns/edge", flush=True)

    # blocked residual: bucket edges by col-block; rows re-sorted inside bucket
    okey = np.lexsort((rows, idx // blk))
    brows = np.zeros((nblk, cap), dtype=np.int32)
    bcols = np.zeros((nblk, cap), dtype=np.int32)
    bcoef = np.zeros((nblk, cap), dtype=np.float32)
    cb = np.bincount(idx // blk, minlength=nblk)
    stb = np.concatenate([[0], np.cumsum(cb)])
    for b in range(nblk):
        sl = okey[stb[b]:stb[b + 1]]
        k = len(sl)
        brows[b, :k] = rows[sl]
        bcols[b, :k] = idx[sl] - b * blk
        # pad rows with n_rows-1 (sorted tail), coef 0
        brows[b, k:] = n_rows - 1
    for b in range(nblk):
        sl = okey[stb[b]:stb[b + 1]]
        bcoef[b, :len(sl)] = coef[sl]

    def blocked_resid(t, br, bc, bw):
        tb = t.reshape(nblk, blk, width)

        def step(acc, xs):
            sub, r, c, w = xs
            vals = sub[c] * w[:, None]
            part = jax.ops.segment_sum(vals, r, num_segments=n_rows,
                                       indices_are_sorted=True)
            return acc + part.T, None

        acc, _ = jax.lax.scan(
            step, jnp.zeros((width, n_rows), jnp.float32),
            (tb, br, bc, bw))
        return jnp.sum(acc, dtype=jnp.float32)

    sec = timeit(jax.jit(blocked_resid), tab, jnp.asarray(brows), jnp.asarray(bcols),
                 jnp.asarray(bcoef))
    print(f"C blocked residual ({nblk}x{blk}): {sec*1e3:.2f} ms -> {sec/m*1e9:.2f} ns/edge",
          flush=True)


if __name__ == "__main__":
    main()

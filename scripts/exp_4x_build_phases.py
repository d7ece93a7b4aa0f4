"""Phase-by-phase timing of build_graph(bsr) internals at synth-reddit4x scale
(host side, CPU platform) — finds which step still takes minutes after the
tile scatter-assign fix.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from bench import load_bench_dataset, maybe_reorder_cached
from cuda_gcn_tpu.data import graph as G

t0 = time.perf_counter()
ds, name = load_bench_dataset("reddit4x", "data")
ds = maybe_reorder_cached(ds, name)
print(f"load+reorder: {time.perf_counter() - t0:.1f}s", flush=True)

csr = ds.graph
n = csr.nrows


def phase(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.1f}s", flush=True)
    return r


indptr = phase("indptr astype", lambda: csr.indptr.astype(np.int64))
indices = phase("indices astype", lambda: csr.indices.astype(np.int64))
coef = phase("normalization", lambda: G.normalization_coefficients(indptr, indices))
src = phase("src repeat", lambda: np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr)))
dst = indices
fwd_key = phase("fwd_key", lambda: src * n + dst)
fwd_sorted = phase("sort fwd", lambda: np.sort(fwd_key))
phase("sort bwd + equal", lambda: np.array_equal(fwd_sorted, np.sort(dst * n + src)))
phase("dupe check", lambda: bool(np.any(fwd_sorted[1:] == fwd_sorted[:-1])))
cap = phase("budget cap", lambda: G.auto_tile_budget(n, len(src)))
bsr, keep = phase("select_bsr_tiles", lambda: G._select_bsr_tiles(
    src, dst, coef, n, G.BSR_DEFAULT_TILE, None, cap,
    G._np_dtype(G.BSR_DEFAULT_DTYPE), unique_edges=True))
rsrc, rdst, rcoef = phase("residual mask", lambda: (src[keep], dst[keep], coef[keep]))
print(f"tiles={bsr[0].shape} residual={len(rsrc)}", flush=True)
tr = phase("transpose_coo", lambda: G._transpose_coo(rsrc, rdst, rcoef))
blk_f = phase("blocked_pack fwd", lambda: G._blocked2d_pack(rsrc, rdst, rcoef, n, G.BLOCKED_RESID_TARGET_BLK))
blk_b = phase("blocked_pack bwd", lambda: G._blocked2d_pack(tr[0], tr[1], tr[2], n, G.BLOCKED_RESID_TARGET_BLK))
print("done (host phases only; device transfer not timed)", flush=True)

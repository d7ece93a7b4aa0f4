"""Device-ready graph container: CSR + symmetric normalization, built once.

The reference recomputes the edge normalization ``1/sqrt(deg(src)*deg(dst))`` on every
forward AND backward pass, per edge (src/seq/module.cpp:91-93,110-112), where the
"degree" is the CSR row length *including* the prepended self-loop. TPU-first design
materializes those coefficients once at graph-build time as the values array of the
normalized adjacency Â = D^-1/2 (A+I) D^-1/2.

Two edge orderings are precomputed so both the forward SpMM (out[src] += c·in[dst],
module.cpp:95-99) and its transpose for the backward pass run over *sorted* segment
ids (no unsorted scatter on TPU):

  * CSR order   — edges sorted by src (row) id; forward aggregation.
  * CSC order   — the same edges sorted by dst id; the backward/transpose aggregation
    (for undirected graphs Â is symmetric so the values coincide, but we build the
    true transpose and stay correct for any input graph).

Additionally a bucketed-ELL packing is derived for the `ell`/`pallas` graphsum
backends: rows are sorted by degree and grouped into power-of-two-width buckets,
each padded with (row 0, coef 0) entries, so aggregation becomes a short static
scan of vectorized row gathers — no scatter at all.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from cuda_gcn_tpu.data.parser import CSR


@dataclasses.dataclass(frozen=True)
class EllBucket:
    """One degree bucket of the ELL packing (host-side, numpy)."""

    rows: np.ndarray   # (R,) int32 node ids whose rows live in this bucket
    cols: np.ndarray   # (R, W) int32 neighbor ids, padded with 0
    coef: np.ndarray   # (R, W) float32 edge coefficients, padded with 0.0
    width: int


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Graph:
    """Device-resident normalized adjacency in several layouts.

    Registered as a pytree so it can be passed straight through ``jax.jit`` /
    ``shard_map``; the integer metadata travels as static aux data.
    """

    # COO, CSR-ordered (sorted by src): forward gathers in[dst], segments by src.
    src: jnp.ndarray       # (nnz,) int32
    dst: jnp.ndarray       # (nnz,) int32
    coef: jnp.ndarray      # (nnz,) float32
    # COO, CSC-ordered (sorted by dst == transpose rows): backward aggregation.
    t_src: jnp.ndarray     # (nnz,) int32  (transpose row id; sorted)
    t_dst: jnp.ndarray     # (nnz,) int32  (transpose col id)
    t_coef: jnp.ndarray    # (nnz,) float32
    # Bucketed ELL packings of the forward and transpose structures (may be empty).
    ell_fwd: tuple         # tuple[EllBucketDev, ...]
    ell_bwd: tuple
    adj: jnp.ndarray | None  # dense [N, N] Â for the 'dense' backend (small graphs)
    # Block-sparse (BSR) dense tiles for the 'bsr' backend. When backend == 'bsr',
    # the COO fields above hold ONLY the residual edges not covered by tiles.
    bsr_tiles: jnp.ndarray | None = None  # [K, TB, TB] tile values
    bsr_rows: jnp.ndarray | None = None   # [K] block-row ids (sorted)
    bsr_cols: jnp.ndarray | None = None   # [K] block-col ids
    bsr_tb: int = 0                       # static tile size
    bsr_nblocks: int = 0                  # static T = padded_nodes // TB
    # Flat bucketed piece-list streaming layouts of the residual COO
    # (large-graph 'bsr' only): bounds the segment-reduction output to a
    # small row window (the >=75 ns/edge cliff at huge outputs) AND keeps
    # gathers inside <=32 MB table windows (~3x faster) — see Blocked2DDev.
    blk_fwd: "Blocked2DDev | None" = None
    blk_bwd: "Blocked2DDev | None" = None
    total_nnz: int = 0                    # nnz of Â incl. tile-covered edges
    resid_nnz: int = 0                    # residual edge count (survives placeholder COO)
    n_nodes: int = 0
    symmetric: bool = False  # True when Â = Âᵀ (undirected input + pair-closed
    # tiles): the backward then routes through the FORWARD structures and no
    # transpose layout is shipped. False is the safe default (real transpose).
    backend: str = "segment"  # static: 'segment' | 'ell' | 'pallas' | 'dense' | 'bsr'

    @property
    def nnz(self) -> int:
        return self.resid_nnz or int(self.src.shape[0])

    def with_backend(self, backend: str) -> "Graph":
        return dataclasses.replace(self, backend=backend)

    def tree_flatten(self):
        leaves = (self.src, self.dst, self.coef, self.t_src, self.t_dst, self.t_coef,
                  self.ell_fwd, self.ell_bwd, self.adj,
                  self.bsr_tiles, self.bsr_rows, self.bsr_cols,
                  self.blk_fwd, self.blk_bwd)
        return leaves, (self.n_nodes, self.symmetric, self.backend,
                        self.bsr_tb, self.bsr_nblocks, self.total_nnz, self.resid_nnz)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (src, dst, coef, t_src, t_dst, t_coef, ell_fwd, ell_bwd, adj,
         bsr_tiles, bsr_rows, bsr_cols, blk_fwd, blk_bwd) = leaves
        return cls(src, dst, coef, t_src, t_dst, t_coef, ell_fwd, ell_bwd, adj,
                   bsr_tiles=bsr_tiles, bsr_rows=bsr_rows, bsr_cols=bsr_cols,
                   blk_fwd=blk_fwd, blk_bwd=blk_bwd,
                   bsr_tb=aux[3], bsr_nblocks=aux[4], total_nnz=aux[5],
                   resid_nnz=aux[6], n_nodes=aux[0], symmetric=aux[1], backend=aux[2])


# 2D-tiled residual (Blocked2DDev): target gather/accumulator window node count
# (~8 MB lane-padded f32) and the node count below which the full activation
# table is already small enough that flat gathers run at near-window speed.
BLOCKED_RESID_TARGET_BLK = 16384
BLOCKED_RESID_MIN_NODES = 3 * BLOCKED_RESID_TARGET_BLK
# Above this residual size, the flat COO device copy is dropped once the
# blocked layout exists (it would only duplicate the same edges in HBM).
FLAT_RESID_MAX_NNZ = 30_000_000
# Gather/accumulator window node bound, as a multiple of the target block:
# 4x target (~32 MB lane-padded f32) is the top of the chip's fast-gather
# window range (docs/PERF.md "blocked gather").
BLOCKED_WINDOW_BOUND_X = 4
# Piece-size buckets: each bucket is one scan program, so their count is
# bounded (compile size); caps are chosen from the actual piece-size
# distribution by a small DP minimizing total padded slots (a fixed ratio-2
# ladder measured 1.33x padding when span-clipped pieces cluster between
# rungs). Sizes are granularized so the DP state stays small.
BLOCKED_MAX_BUCKETS = 6
BLOCKED_CAP_GRANULARITY = 64


def _ceil8(v) -> int:
    return max(int(-(-int(v) // 8) * 8), 8)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PieceBucket:
    """One cap-size class of the flat 2D-residual piece list (device arrays).

    Pieces are ordered band-major, so consecutive pieces usually share their
    accumulator window; ``flush`` marks the first piece of a new row band
    (the previous window is written back and the new one loaded there)."""

    r0: jnp.ndarray     # (P,) int32 accumulator-window start row per piece
    c0: jnp.ndarray     # (P,) int32 gather-window start col per piece
    flush: jnp.ndarray  # (P,) bool: band changed vs the previous piece
    # rows/cols are WINDOW-LOCAL, so they pack into 16-bit lanes (int16 when
    # rbw <= 32767, uint16 when width <= 65536 — both hold at the standard
    # 16384/65536 geometry): at 344M residual edges (16x-reddit) this halves
    # the dominant HBM argument. The device apply upcasts per piece
    # (ops/graphsum._piece_part — a [cap]-sized transient, nothing).
    rows: jnp.ndarray   # (P, cap) int16|int32 window-local rows, sorted; pad = rbw
    cols: jnp.ndarray   # (P, cap) uint16|int32 window-local gather ids; pad 0
    coef: jnp.ndarray   # (P, cap) float32|bfloat16 (the run's compute dtype;
    # the apply casts to h.dtype before multiplying either way, so storing
    # bf16 for bf16 runs is bit-identical); pad 0.0

    def tree_flatten(self):
        return ((self.r0, self.c0, self.flush, self.rows, self.cols, self.coef), None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Blocked2DDev:
    """Flat bucketed piece list — the streaming residual aggregation layout
    for large graphs (round 3; replaces the round-2 [band, col, cap] rectangle
    whose global cap/nc maxima cost ~2.2x padded slots on the skewed
    8x-reddit residual, VERDICT round-2 weak #1).

    Measured cliff this layout exists for (docs/PERF.md "segment-output
    cliff", scripts/exp_stream4x.py): at ~73M edges aggregating into a
    ~932K-row output the XLA gather+segment_sum pipeline degrades to ~4.5 ns
    per edge*feature-element, while the same edges reduced into ~16K-row
    windows with bounded gather windows run ~10 ns/edge width-independent.

    Structure: every edge belongs to exactly one *piece*. A piece is <=cap
    edges sharing one accumulator window ``[r0, r0+rbw)`` (its row band) and
    one gather window ``[c0, c0+width)`` (its column window). Pieces are
    grouped into ratio-2 size buckets (per-bucket cap — a small piece never
    pays a large piece's padding) and ordered band-major within each bucket.
    Window geometry (pack time, `_blocked2d_plan`):

    * row bands: greedy edge-count-quantile cuts over the row-sorted edges,
      span-bounded at BLOCKED_WINDOW_BOUND_X x target (static ``rbw``);
    * column windows per band: greedy edge-target cuts over the band's
      col-sorted edges, same span bound (static ``width``, <=32 MB f32
      lane-padded gather windows — the ~4 ns/row path);
    * per-piece rows are LOCAL to the band (sorted; pad = rbw, dropped by the
      [rbw+1]-segment reduction), cols LOCAL to the window (pad 0, coef 0);
    * r0/c0 are pre-clamped to ``n_pad8 - rbw/width`` so the device apply
      never pads the activation table beyond 8-row alignment (the round-2
      apply copied the whole table per pass, VERDICT round-2 weak #6).

    The reference's counterpart is its gather-formulated GraphSum kernel pair
    (src/cuda/cuda_kernel.cu:126-162), which never faced this regime — its max
    demonstrated scale is reddit (report.pdf §3.2).
    """

    buckets: tuple      # tuple[PieceBucket, ...], caps descending
    rbw: int = 0        # static accumulator window rows
    width: int = 0      # static gather window width
    n_pad8: int = 0     # static activation-table rows (n rounded up to 8)

    def tree_flatten(self):
        return ((self.buckets,), (self.rbw, self.width, self.n_pad8))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(buckets=leaves[0], rbw=aux[0], width=aux[1], n_pad8=aux[2])


def _blocked2d_plan(rows: np.ndarray, cols: np.ndarray, n: int,
                    target_blk: int = BLOCKED_RESID_TARGET_BLK,
                    target_e: int | None = None):
    """Pass 1 of the flat pack: cut row bands and column windows, emit pieces.

    Greedy edge-space walks (O(m log m) total — no per-band O(n) histograms,
    ADVICE round-2): a band/window ends at whichever comes first, the
    edge-count target (equal-work pieces, ~zero padding on uniform residuals)
    or the node-span bound (window locality on skewed ones). Hub rows/columns
    with more than ``target_e`` edges simply continue as further pieces at the
    same window start — accumulation makes the split exact, and no global cap
    inflation occurs (the round-2 hub-tile problem).

    Returns dict(pieces=[(band, r0, c0, edge_idx)...], rspan, cspan) or None
    for an empty edge set. ``edge_idx`` are global indices, row-sorted.
    """
    m = len(rows)
    if m == 0:
        return None
    # int32 halves the sort bandwidth (node ids always fit; n < 2^31)
    rows = rows.astype(np.int32, copy=False)
    cols = cols.astype(np.int32, copy=False)
    bound = BLOCKED_WINDOW_BOUND_X * target_blk
    nb_t = max(-(-n // target_blk), 1)
    target_be = max(-(-m // nb_t), 1)
    # Row bands are span-bounded at 1x target (not the 4x column bound): every
    # piece pays a fixed [rbw+1, d] segment-output cost of ~1.5 ns/row
    # regardless of its edge count (measured, scripts/exp_flatpack.py — a
    # 65536-row rbw put the skewed residual at 28.7 ns/edge; 16384 amortizes)
    band_st = [0]
    i = 0
    while i < m:
        j = min(i + target_be, m)
        j2 = int(np.searchsorted(rows, rows[i] + target_blk, side="left"))
        j = max(min(j, j2), i + 1)
        band_st.append(j)
        i = j
    nb = len(band_st) - 1
    rspan_max = max(int(rows[band_st[b + 1] - 1]) - int(rows[band_st[b]]) + 1
                    for b in range(nb))
    if target_e is None:
        # pieces must be big enough to amortize the fixed per-piece cost —
        # the [rbw+1, d] segment output (~1.5 ns/row) and, in the cond-free
        # 'rmw' apply, the accumulator-window read+write (~1 KB/row): 4 band
        # spans of edges puts both at a few percent of piece gather work
        target_e = max(-(-m // (nb * nb_t)), 4 * _ceil8(rspan_max), 1)
    pieces = []
    rspan = cspan = 1
    for b in range(nb):
        lo, hi = band_st[b], band_st[b + 1]
        r0 = int(rows[lo])
        rspan = max(rspan, int(rows[hi - 1]) - r0 + 1)
        perm = np.argsort(cols[lo:hi]) + lo
        cs = cols[perm]
        mb = hi - lo
        i = 0
        while i < mb:
            j = min(i + target_e, mb)
            j2 = int(np.searchsorted(cs, cs[i] + bound, side="left"))
            j = max(min(j, j2), i + 1)
            c0 = int(cs[i])
            cspan = max(cspan, int(cs[j - 1]) - c0 + 1)
            e = perm[i:j]
            e = e[np.argsort(rows[e])]  # sorted segment ids
            pieces.append((b, r0, c0, e))
            i = j
    return dict(pieces=pieces, rspan=rspan, cspan=cspan, target_e=target_e)


def _cap_ladder(sizes, max_buckets: int = BLOCKED_MAX_BUCKETS) -> list[int]:
    """Choose <=max_buckets bucket caps minimizing total padded slots.

    Every piece pays the smallest cap >= its size; caps are drawn from the
    granularized size classes themselves (exact DP over <=~400 classes —
    cost(j..k) = u_k * count(j..k); O(B U^2) with vectorized inner min).
    Returns caps descending."""
    g = BLOCKED_CAP_GRANULARITY

    def gran(s):
        return _ceil8(s) if s <= 16 * g else -(-int(s) // g) * g

    u, counts = np.unique([gran(int(s)) for s in sizes], return_counts=True)
    nu = len(u)
    if nu <= max_buckets:
        return [int(c) for c in u[::-1]]
    w = counts.astype(np.int64)
    cw = np.concatenate([[0], np.cumsum(w)])
    inf = float("inf")
    f = np.full((max_buckets + 1, nu), inf)
    arg = np.zeros((max_buckets + 1, nu), np.int64)
    f[1] = u * cw[1:]
    for b in range(2, max_buckets + 1):
        f[b][0] = f[1][0]
        for k in range(1, nu):
            cand = f[b - 1][:k] + u[k] * (cw[k + 1] - cw[1:k + 1])
            j = int(np.argmin(cand))
            if cand[j] < f[1][k]:
                f[b][k], arg[b][k] = cand[j], j + 1  # classes [j+1..k] -> cap u[k]
            else:
                f[b][k], arg[b][k] = f[1][k], 0
    caps = []
    b, k = max_buckets, nu - 1
    while k >= 0:
        caps.append(int(u[k]))
        lo = int(arg[b][k]) if b > 1 else 0
        if lo == 0:
            break
        k, b = lo - 1, b - 1
    return caps


def _blocked2d_materialize(plan, rows, cols, coef, rbw: int, width: int,
                           n_pad8: int, caps: list[int],
                           coef_dtype=np.float32) -> dict:
    """Pass 2: bucket pieces by size (smallest cap >= size) and fill arrays.
    Returns {cap: dict(r0, c0, flush, rows, cols, coef)} for non-empty caps.
    rows/cols compact to 16-bit when the window geometry allows (PieceBucket);
    ``coef_dtype`` is the run's compute dtype (casting at build time equals
    the apply's per-multiply cast, at half the HBM)."""
    by_cap: dict[int, list] = {c: [] for c in caps}
    for p in plan["pieces"]:
        sz = len(p[3])
        by_cap[min(c for c in caps if c >= sz)].append(p)
    row_dt = np.int16 if rbw <= np.iinfo(np.int16).max else np.int32
    col_dt = np.uint16 if width <= (1 << 16) else np.int32
    # one bulk cast (per-piece casts through ml_dtypes are far slower)
    coef = coef.astype(coef_dtype, copy=False)
    out = {}
    for cap in caps:
        plist = by_cap[cap]
        if not plist:
            continue
        np_ = len(plist)
        r0 = np.zeros(np_, np.int32)
        c0 = np.zeros(np_, np.int32)
        flush = np.zeros(np_, bool)
        rr = np.full((np_, cap), rbw, row_dt)
        cc = np.zeros((np_, cap), col_dt)
        ww = np.zeros((np_, cap), coef_dtype)
        prev_band = plist[0][0]
        for k, (b, pr0, pc0, e) in enumerate(plist):
            pr0 = min(pr0, n_pad8 - rbw)
            pc0 = min(pc0, n_pad8 - width)
            r0[k], c0[k] = pr0, pc0
            flush[k] = bool(k) and b != prev_band
            prev_band = b
            sz = len(e)
            rr[k, :sz] = rows[e] - pr0
            cc[k, :sz] = cols[e] - pc0
            ww[k, :sz] = coef[e]
        out[cap] = dict(r0=r0, c0=c0, flush=flush, rows=rr, cols=cc, coef=ww)
    return out


def _blocked2d_pack_multi(parts, n: int,
                          target_blk: int = BLOCKED_RESID_TARGET_BLK,
                          coef_dtype=np.float32):
    """Pack one or more (rows, cols, coef) edge sets over an n-row node space
    with SHARED static geometry (rbw, width, n_pad8, cap ladder) — multi-part
    callers (parallel/partition.py) need one static program across parts.
    Returns (bucket_dicts_per_part, rbw, width, n_pad8, caps) or None if any
    part is empty (all-or-nothing, matching the partitioner's contract)."""
    plans = [_blocked2d_plan(r, c, n, target_blk) for (r, c, _) in parts]
    if any(p is None for p in plans):
        return None
    n_pad8 = _ceil8(n)
    rbw = min(_ceil8(max(p["rspan"] for p in plans)), n_pad8)
    width = min(_ceil8(max(p["cspan"] for p in plans)), n_pad8)
    caps = _cap_ladder([len(e) for p in plans for (_, _, _, e) in p["pieces"]])
    per_part = [
        _blocked2d_materialize(plan, r, c, w, rbw, width, n_pad8, caps,
                               coef_dtype=coef_dtype)
        for plan, (r, c, w) in zip(plans, parts)
    ]
    return per_part, rbw, width, n_pad8, caps


def _blocked2d_pack(rows: np.ndarray, cols: np.ndarray, coef: np.ndarray,
                    n: int, target_blk: int = BLOCKED_RESID_TARGET_BLK,
                    coef_dtype=np.float32) -> "Blocked2DDev | None":
    packed = _blocked2d_pack_multi([(rows, cols, coef)], n, target_blk,
                                   coef_dtype=coef_dtype)
    if packed is None:
        return None
    per_part, rbw, width, n_pad8, caps = packed
    buckets = tuple(
        PieceBucket(r0=jnp.asarray(b["r0"]), c0=jnp.asarray(b["c0"]),
                    flush=jnp.asarray(b["flush"]), rows=jnp.asarray(b["rows"]),
                    cols=jnp.asarray(b["cols"]), coef=jnp.asarray(b["coef"]))
        for cap in caps if (b := per_part[0].get(cap)) is not None)
    return Blocked2DDev(buckets=buckets, rbw=rbw, width=width, n_pad8=n_pad8)


def blocked2d_stats(b2: "Blocked2DDev") -> dict:
    """Padding accounting for the flat piece list (evidence artifacts;
    VERDICT round-2 directive #1: padded slots must stay <=1.3x real edges)."""
    real = slots = pieces = 0
    per_bucket = []
    for bk in b2.buckets:
        r = np.asarray(bk.rows)
        br = int((r != b2.rbw).sum())
        real += br
        slots += r.size
        pieces += r.shape[0]
        per_bucket.append(dict(cap=int(r.shape[1]), pieces=int(r.shape[0]),
                               real_edges=br))
    return dict(real_edges=real, padded_slots=slots, pieces=pieces,
                pad_ratio=round(slots / max(real, 1), 4),
                rbw=b2.rbw, width=b2.width, buckets=per_bucket)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EllBucketDev:
    """Device-side ELL bucket (pytree)."""

    rows: jnp.ndarray   # (R,) int32
    cols: jnp.ndarray   # (R, W) int32
    coef: jnp.ndarray   # (R, W) float32

    def tree_flatten(self):
        return (self.rows, self.cols, self.coef), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


# Above this edge count the native C++ build kernels (csrc/gcn_build.cpp) take
# over the host-side hot loops when the toolchain/lib is available; below it
# (and always as the tested oracle) the numpy implementations run.
NATIVE_BUILD_MIN_NNZ = 2_000_000


def _native_build():
    from cuda_gcn_tpu.data import native_build

    return native_build if native_build.available() else None


def normalization_coefficients(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Per-edge Â values: 1/sqrt(rowlen(src) * rowlen(dst)) (module.cpp:91-93).

    Row lengths include the self-loop the parser prepended, so this equals the
    standard GCN D^-1/2 (A+I) D^-1/2 normalization.
    """
    if int(indptr[-1]) >= NATIVE_BUILD_MIN_NNZ:
        nb = _native_build()
        if nb is not None:
            return nb.norm_coef(indptr, indices)
    deg = np.diff(indptr).astype(np.float64)
    src = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
    return (1.0 / np.sqrt(deg[src] * deg[indices])).astype(np.float32)


def _ell_widths(deg: np.ndarray) -> np.ndarray:
    """ELL bucket width per row: tight multiples of 8 for small degrees (pow2
    buckets waste up to ~2x in padded gathers when degrees cluster just above a
    power of two), multiples of 64 mid-range, pow2 for the hub tail. All widths
    divide evenly into the 8/64-column chunks the ell/pallas kernels scan."""
    d = np.maximum(deg, 1)
    pow2 = (2 ** np.ceil(np.log2(d))).astype(np.int64)
    return np.where(d <= 64, ((d + 7) // 8) * 8,
                    np.where(d <= 512, ((d + 63) // 64) * 64, pow2)).astype(np.int64)


def _ell_pack(rows_sorted: np.ndarray, deg: np.ndarray, col_of: np.ndarray,
              coef_of: np.ndarray, indptr: np.ndarray) -> list[EllBucket]:
    """Bucket rows by width class; pad each bucket's rows to the bucket width."""
    buckets: list[EllBucket] = []
    if len(rows_sorted) == 0:
        return buckets
    deg_sorted = deg[rows_sorted]
    bucket_id = _ell_widths(deg_sorted)
    for b in np.unique(bucket_id):
        sel = rows_sorted[bucket_id == b]
        width = int(b)
        r = len(sel)
        cols = np.zeros((r, width), dtype=np.int32)
        coef = np.zeros((r, width), dtype=np.float32)
        # vectorized fill: flat slot index = bucket_row * width + within-row slot
        deg_sel = deg[sel].astype(np.int64)
        lo = indptr[sel].astype(np.int64)
        total = int(deg_sel.sum())
        if total:
            rep_row = np.repeat(np.arange(r, dtype=np.int64), deg_sel)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(deg_sel) - deg_sel, deg_sel)
            edge_idx = np.repeat(lo, deg_sel) + within
            flat = rep_row * width + within
            cols.reshape(-1)[flat] = col_of[edge_idx]
            coef.reshape(-1)[flat] = coef_of[edge_idx]
        buckets.append(EllBucket(rows=sel.astype(np.int32), cols=cols, coef=coef, width=width))
    return buckets


def build_ell(indptr: np.ndarray, indices: np.ndarray, coef: np.ndarray) -> list[EllBucket]:
    n = len(indptr) - 1
    deg = np.diff(indptr)
    order = np.argsort(deg, kind="stable")
    return _ell_pack(order, deg, indices, coef, indptr)


def _transpose_coo(src: np.ndarray, dst: np.ndarray, coef: np.ndarray,
                   n: int | None = None):
    if len(src) >= NATIVE_BUILD_MIN_NNZ:
        nb = _native_build()
        if nb is not None:
            nn = n if n is not None else (int(dst.max()) + 1 if len(dst) else 1)
            return nb.transpose_coo(src, dst, coef, nn)
    perm = np.argsort(dst, kind="stable")
    return dst[perm], src[perm], coef[perm]


def _coo_to_csr(rows_sorted: np.ndarray, n: int) -> np.ndarray:
    """indptr from row ids that are already sorted ascending."""
    counts = np.bincount(rows_sorted, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr


# 'auto' backend: dense MXU matmul below this node count; block-sparse tiles
# (dense MXU tiles + COO residual) above.
DENSE_BACKEND_MAX_NODES = 8192
BSR_DEFAULT_TILE = 256
# None => derive the tile budget from the chip's HBM minus the graph's other
# device-resident needs (auto_tile_budget); an int pins it explicitly.
BSR_DEFAULT_BUDGET_BYTES: int | None = None
BSR_DEFAULT_DTYPE = "bfloat16"
# Fallback HBM size when the device reports no memory stats: the tunneled
# bench TPU (v5 lite) proved 15.75 GB usable in an OOM dump (docs/PERF.md
# "Beyond reddit"); stay slightly under.
ASSUMED_TPU_HBM_BYTES = int(15.5 * (1 << 30))
# Break-even constant from chip calibration (docs/PERF.md): a tile is worth
# densifying when streaming its bytes costs less than the ~12.3 ns/edge HBM
# gathers it replaces; at ~250 GB/s that is bytes/3075 — use bytes/2048 to
# leave margin for the einsum overheads.
BSR_BREAK_EVEN_BYTES_PER_EDGE = 2048


def build_graph(csr: CSR, with_ell: bool = True, backend: str = "auto",
                bsr_tile: int = BSR_DEFAULT_TILE, bsr_min_edges: int | None = None,
                bsr_budget_bytes: int | None = BSR_DEFAULT_BUDGET_BYTES,
                bsr_dtype: str = BSR_DEFAULT_DTYPE,
                blocked_blk: int = BLOCKED_RESID_TARGET_BLK,
                blocked_min_nodes: int = BLOCKED_RESID_MIN_NODES,
                aux_bytes: int = 0, act_itemsize: int = 4) -> Graph:
    """Construct the device Graph from a parsed adjacency CSR (self-loops included).

    ``bsr_budget_bytes=None`` derives the tile budget from device HBM minus the
    run's other residents (auto_tile_budget); ``aux_bytes`` lets the caller
    declare residents this module can't see (e.g. the dense feature matrix)."""
    n = csr.nrows
    if backend == "auto":
        backend = "dense" if n <= DENSE_BACKEND_MAX_NODES else "bsr"
    indptr = csr.indptr.astype(np.int64)
    indices = csr.indices.astype(np.int64)
    coef = normalization_coefficients(indptr, indices)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    dst = indices

    # symmetry check (pattern): transpose edge set equals forward edge set
    fwd_key = src * n + dst
    fwd_sorted = np.sort(fwd_key)
    symmetric = bool(np.array_equal(fwd_sorted, np.sort(dst * n + src)))
    # a dataset CAN list the same neighbor twice (the reference's parser keeps
    # duplicates and they contribute twice); unique edges enable the fast
    # scatter-assign tile build below
    unique_edges = not bool(np.any(fwd_sorted[1:] == fwd_sorted[:-1]))

    bsr = None
    resid_symmetric = symmetric
    if backend == "bsr":
        if bsr_budget_bytes is None:
            bsr_budget_bytes = resolve_tile_budget(
                n, len(src), bsr_tile, _np_dtype(bsr_dtype), bsr_min_edges,
                aux_bytes, symmetric=symmetric, act_itemsize=act_itemsize)
        bsr, keep_residual = _select_bsr_tiles(
            src, dst, coef, n, bsr_tile, bsr_min_edges, bsr_budget_bytes,
            _np_dtype(bsr_dtype), unique_edges=unique_edges)
        if symmetric and bsr is not None and len(bsr[1]):
            bsr, keep_residual = _symmetrize_tile_set(bsr, keep_residual, src, dst)
        src, dst, coef = src[keep_residual], dst[keep_residual], coef[keep_residual]

    if resid_symmetric:
        # Â symmetric and (for bsr) a pair-closed tile set: the residual edge
        # multiset is symmetric, its values are 1/sqrt(d_src*d_dst) (endpoint-
        # symmetric), and CSR order sorts (row, col) — so the row-sorted
        # transpose COO is ELEMENTWISE equal to the forward COO. Don't build
        # (or SHIP) a transpose at all: graphsum routes the backward through
        # the forward structures via the static ``symmetric`` flag. Round-3
        # lesson: merely aliasing the device arrays (t_src = src) is not
        # enough — aliased leaves become two jit parameters and XLA's memory
        # assignment counts the buffer TWICE (the 16x OOM dump bills 14.53 GB
        # of arguments for ~11 GB of actual buffers, /tmp/bench16x.log).
        t_src = t_dst = np.zeros(0, np.int64)
        t_coef = np.zeros(0, np.float32)
    else:
        t_src, t_dst, t_coef = _transpose_coo(src, dst, coef, n)

    coef_dtype = _np_dtype("bfloat16") if act_itemsize == 2 else np.float32
    blk_fwd = blk_bwd = None
    resid_nnz = len(src)
    if backend == "bsr" and n >= blocked_min_nodes:
        blk_fwd = _blocked2d_pack(src, dst, coef, n, blocked_blk,
                                  coef_dtype=coef_dtype)
        # asymmetric graphs carry a real transpose layout; symmetric ones
        # leave blk_bwd=None (the transpose IS the forward operator)
        blk_bwd = None if resid_symmetric else _blocked2d_pack(
            t_src, t_dst, t_coef, n, blocked_blk, coef_dtype=coef_dtype)

    # At large scale the flat residual COO (6 arrays x nnz) would only
    # duplicate the blocked layout in HBM; keep a placeholder instead. The
    # real edge count stays readable via Graph.nnz (resid_nnz aux).
    if (blk_fwd is not None and (resid_symmetric or blk_bwd is not None)
            and resid_nnz > FLAT_RESID_MAX_NNZ):
        src = dst = np.zeros(0, np.int64)
        coef = np.zeros(0, np.float32)
        t_src = t_dst = np.zeros(0, np.int64)
        t_coef = np.zeros(0, np.float32)

    ell_fwd: tuple = ()
    ell_bwd: tuple = ()
    # Note: the 'bsr' residual deliberately stays on the sorted-segment path —
    # ELL's padded widths cost ~26% extra gathers on the low-degree residual,
    # which cancels the scatter-free win (measured, docs/PERF.md).
    if with_ell and backend in ("ell", "pallas"):
        f_indptr = indptr
        f_indices = indices.astype(np.int32)
        fwd_buckets = _ell_pack(
            np.argsort(np.diff(f_indptr), kind="stable"),
            np.diff(f_indptr), f_indices, coef, f_indptr,
        )
        ell_fwd = tuple(EllBucketDev(jnp.asarray(b.rows), jnp.asarray(b.cols), jnp.asarray(b.coef))
                        for b in fwd_buckets)
        if not resid_symmetric:  # symmetric: graphsum routes bwd via ell_fwd
            t_indptr = _coo_to_csr(t_src, n)
            bwd_buckets = _ell_pack(
                np.argsort(np.diff(t_indptr), kind="stable"),
                np.diff(t_indptr), t_dst.astype(np.int32), t_coef, t_indptr,
            )
            ell_bwd = tuple(EllBucketDev(jnp.asarray(b.rows), jnp.asarray(b.cols), jnp.asarray(b.coef))
                            for b in bwd_buckets)

    adj = None
    if backend == "dense":
        dense = np.zeros((n, n), dtype=np.float32)
        np.add.at(dense, (src, dst), coef)
        adj = jnp.asarray(dense)

    bsr_kwargs: dict = {}
    if bsr is not None:
        tiles, rows, cols, tb, nblocks = bsr
        bsr_kwargs = dict(
            bsr_tiles=jnp.asarray(tiles), bsr_rows=jnp.asarray(rows),
            bsr_cols=jnp.asarray(cols), bsr_tb=tb, bsr_nblocks=nblocks)

    d_src = jnp.asarray(src, jnp.int32)
    d_dst = jnp.asarray(dst, jnp.int32)
    d_coef = jnp.asarray(coef)
    # symmetric graphs ship EMPTY transpose fields (zero HBM, zero jit
    # parameters); graphsum's backward routes through the forward structures
    d_t_src = jnp.asarray(t_src, jnp.int32)
    d_t_dst = jnp.asarray(t_dst, jnp.int32)
    d_t_coef = jnp.asarray(t_coef)
    return Graph(
        **bsr_kwargs,
        resid_nnz=resid_nnz,
        src=d_src,
        dst=d_dst,
        coef=d_coef,
        t_src=d_t_src,
        t_dst=d_t_dst,
        t_coef=d_t_coef,
        ell_fwd=ell_fwd,
        ell_bwd=ell_bwd,
        adj=adj,
        blk_fwd=blk_fwd,
        blk_bwd=blk_bwd,
        total_nnz=int(csr.nnz),
        n_nodes=n,
        symmetric=symmetric,
        backend=backend,
    )


def device_hbm_bytes() -> int:
    """Usable accelerator memory. Resolution order: CUDA_GCN_TPU_HBM_BYTES env
    var (deterministic override for tests/CI), device memory_stats, then the
    measured tunneled-chip constant (the bench TPU reports no memory stats)."""
    import os

    env = os.environ.get("CUDA_GCN_TPU_HBM_BYTES")
    if env:
        return int(env)
    platform = "tpu"
    try:
        dev = jax.devices()[0]
        platform = dev.platform
        stats = dev.memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return limit
    except Exception:
        pass
    if platform == "cpu":
        # a CPU host reporting no memory stats must NOT inherit the 15.5 GB
        # TPU constant (ADVICE round-2): budget from available host RAM,
        # conservatively halved (the tile arrays are not the only resident)
        try:
            pages = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            return max(pages // 2, 1 << 30)
        except (ValueError, OSError):
            return 4 << 30
    return ASSUMED_TPU_HBM_BYTES


def resolve_tile_budget(n: int, nnz: int, tb: int, dtype,
                        min_edges: int | None = None, aux_bytes: int = 0,
                        symmetric: bool = False, act_itemsize: int = 4) -> int:
    """Resolve the auto (None) tile budget for one device holding an n-row
    graph with nnz edges. Small graphs — where even materializing EVERY
    candidate tile stays under the 1 GB floor — resolve deterministically
    without querying devices; larger ones derive the budget from HBM
    (auto_tile_budget). Shared by build_graph and partition_graph so the
    policy exists once. ``symmetric`` graphs reserve ONE residual layout
    (the transpose aliases it — see build_graph's resid_symmetric path)."""
    item = dtype.itemsize
    min_e = min_edges or max(tb * tb * item // BSR_BREAK_EVEN_BYTES_PER_EDGE, 8)
    tiles_ub_bytes = (nnz // min_e + 1) * tb * tb * item
    if tiles_ub_bytes <= (1 << 30):
        return 1 << 30
    budget = auto_tile_budget(n, nnz, aux_bytes, symmetric=symmetric,
                              act_itemsize=act_itemsize)
    import logging

    logging.getLogger(__name__).info(
        "auto tile budget: %.2f GB", budget / (1 << 30))
    return budget


def auto_tile_budget(n: int, total_nnz: int, aux_bytes: int = 0,
                     hbm_bytes: int | None = None,
                     symmetric: bool = False, act_itemsize: int = 4) -> int:
    """Tile budget = HBM minus everything else the training run keeps resident.

    Replaces the old flat 35%-of-HBM / 5 GB-fallback cap, which left half the
    chip idle at 4x-reddit scale (tile coverage 16%, docs/PERF.md). Reserves:

    * ``aux_bytes`` — caller-known residents (dense features, lane-padded);
    * activations — ~4 live [N, <=128-lane] f32 arrays during the fused
      train+eval step (pair activations, scan carry, segment partials);
    * residual COO — blocked layout, counted at FULL nnz (upper bound: tiles
      only shrink it); ONE direction when ``symmetric`` (the backward layout
      aliases the forward one, build_graph resid_symmetric), both otherwise;
    * 1 GB headroom for XLA temporaries.
    """
    hbm = hbm_bytes if hbm_bytes is not None else device_hbm_bytes()
    # lane-padded [N, <=128] rows at the run's compute dtype (bf16 halves this
    # reserve — at 16x that is 3.8 GB of tile budget back)
    act_bytes = 4 * n * 128 * act_itemsize
    # compact piece slots: int16 rows + uint16 cols + coef at the compute
    # dtype (PieceBucket); x1.10 padding headroom — the round-3 flat bucketed
    # piece list measures 1.02x padded slots even on the skewed 8x residual
    directions = 1 if symmetric else 2
    resid_bytes = int(directions * (4 + act_itemsize) * total_nnz * 1.10)
    headroom = 1 << 30
    budget = hbm - aux_bytes - act_bytes - resid_bytes - headroom
    return max(budget, 1 << 30)


def _np_dtype(name: str) -> np.dtype:
    """numpy dtype by name, including bfloat16 (via ml_dtypes, shipped with jax)."""
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def _symmetrize_tile_set(bsr, keep_residual, src, dst):
    """Pair-close a tile selection on a symmetric graph: drop off-diagonal
    tiles whose mirror (J, I) didn't survive the budget cut (both selection
    paths cut densest-first with (count desc, id asc) ties, which can split a
    mirror pair exactly at the budget boundary) and return their edges to the
    residual. A pair-closed tile set keeps the residual edge multiset
    symmetric, which is what lets build_graph alias the backward layouts to
    the forward ones (zero-copy transpose of a symmetric operator)."""
    tiles, rows, cols, tb, t_blocks = bsr
    key = rows.astype(np.int64) * t_blocks + cols
    mirror = cols.astype(np.int64) * t_blocks + rows
    paired = np.isin(mirror, key, assume_unique=True)
    if paired.all():
        return bsr, keep_residual
    dropped = np.sort(key[~paired])
    tile_id = (src // tb) * t_blocks + dst // tb
    pos = np.searchsorted(dropped, tile_id)
    pos = np.minimum(pos, len(dropped) - 1)
    keep = keep_residual | (dropped[pos] == tile_id)
    return (tiles[paired], rows[paired], cols[paired], tb, t_blocks), keep


def _select_bsr_tiles(src, dst, coef, n, tb, min_edges, budget_bytes,
                      dtype=None, unique_edges=False):
    """Pick the densest [tb x tb] tiles of Â and materialize them as dense blocks.

    The 'bsr' backend's cost model (measured on the target chip, docs/PERF.md):
    an HBM random row gather costs ~12.3 ns per edge regardless of feature
    width, while dense tiles stream at full bandwidth and multiply on the MXU.
    A tile is worth densifying when streaming its bytes is cheaper than the
    per-edge gathers it replaces (BSR_BREAK_EVEN_BYTES_PER_EDGE).

    Returns ((tiles [K,tb,tb] dtype, rows [K], cols [K] sorted by (row,col), tb, T),
             keep_mask for residual edges).
    """
    if dtype is None:
        dtype = _np_dtype(BSR_DEFAULT_DTYPE)
    if min_edges is None:
        min_edges = max(tb * tb * dtype.itemsize // BSR_BREAK_EVEN_BYTES_PER_EDGE, 8)
    max_tiles = max(int(budget_bytes // (tb * tb * dtype.itemsize)), 0)
    if len(src) >= NATIVE_BUILD_MIN_NNZ:
        nb = _native_build()
        if nb is not None:
            native = nb.select_tiles(src, dst, coef, n, tb, min_edges,
                                     max_tiles, dtype, unique_edges)
            if native is not None:  # None: combination needs the numpy path
                return native
    t_blocks = -(-n // tb)
    tile_r = src // tb
    tile_c = dst // tb
    tile_id = tile_r * t_blocks + tile_c
    counts = np.bincount(tile_id, minlength=t_blocks * t_blocks)
    candidates = np.flatnonzero(counts >= min_edges)
    # budget cap: densest first
    if len(candidates) > max_tiles:
        order = np.argsort(-counts[candidates], kind="stable")
        candidates = candidates[order[:max_tiles]]
    candidates = np.sort(candidates)  # (row, col) sorted -> sorted block rows
    k = len(candidates)
    if k == 0:
        return (np.zeros((0, tb, tb), dtype), np.zeros(0, np.int32),
                np.zeros(0, np.int32), tb, t_blocks), np.ones(len(src), dtype=bool)

    rank_of = np.full(t_blocks * t_blocks, -1, dtype=np.int64)
    rank_of[candidates] = np.arange(k)
    edge_rank = rank_of[tile_id]
    in_tile = edge_rank >= 0

    flat = (edge_rank[in_tile] * tb * tb
            + (src[in_tile] % tb) * tb + (dst[in_tile] % tb))
    if unique_edges:
        # no accumulation needed: scatter-assign straight into the target
        # dtype. The generic path below costs minutes at reddit scale and
        # above (np.add.at runs ~2 µs/edge, and ml_dtypes' f32->bf16 astype
        # of multi-GB tile arrays is slower than the whole rest of the build).
        tiles = np.zeros((k, tb, tb), dtype=dtype)
        tiles.reshape(-1)[flat] = coef[in_tile].astype(dtype)
    else:
        tiles = np.zeros((k, tb, tb), dtype=np.float32)
        np.add.at(tiles.reshape(-1), flat, coef[in_tile])
        tiles = tiles.astype(dtype)

    rows = (candidates // t_blocks).astype(np.int32)
    cols = (candidates % t_blocks).astype(np.int32)
    return (tiles, rows, cols, tb, t_blocks), ~in_tile


def require_flat_coo(graph: Graph, consumer: str) -> None:
    """Large-graph Graphs drop the flat residual COO once the 2D streaming
    layout exists (FLAT_RESID_MAX_NNZ); any consumer needing the flat arrays
    must fail loudly instead of silently aggregating zero edges. The single
    guard shared by every flat-COO consumer (graphsum dispatch, dense_adjacency)."""
    if graph.resid_nnz > 0 and int(graph.src.shape[0]) == 0:
        raise ValueError(
            f"Graph carries {graph.resid_nnz} residual edges but its flat COO "
            f"was dropped (resid_nnz > FLAT_RESID_MAX_NNZ); {consumer} needs "
            f"the flat layout — rebuild with build_graph(...) for this use")


def dense_adjacency(graph: Graph) -> jnp.ndarray:
    """Materialize Â as a dense [N, N] matrix (small graphs / oracle / MXU backend)."""
    n = graph.n_nodes
    require_flat_coo(graph, "dense_adjacency")
    a = jnp.zeros((n, n), jnp.float32)
    return a.at[graph.src, graph.dst].add(graph.coef)

"""Graph partitioner: 1-D node-block partition of Â with halo-exchange metadata.

The reference has NO multi-device story — reddit runs on one GPU and waits
(SURVEY.md §2.4, report §3.3: 106 s). This layer is the TPU build's scaling axis:
the graph analog of sequence parallelism. Nodes are split into P contiguous
blocks (one per device along the mesh's 'graph' axis); each device owns the CSR
rows of its block. Per layer, edges whose destination lives on another device
need that device's activations — the *halo*. We precompute, entirely on host:

* per-part local COO (row ids rebased into the block, padded to a uniform Emax)
  plus its transpose, both sorted, so aggregation stays sorted-segment-sum on
  every device (no unsorted scatter in the hot path);
* offset-bucketed send lists: the exchange runs as P-1 static-shape
  ``ppermute`` rounds (ring offset k ships q -> (q+k)%P); each round's buffer
  is sized to the max need AT THAT OFFSET, so total comm volume tracks the
  actual boundary structure instead of the global worst (p, q) pair;
* destination remapping into the local index space
  ``[own block (B) | halo buffer (sum_k hmax_k)]``.

All shapes are uniform across parts (SPMD requires one static program), padded
with coefficient-0 edges pointing at the last segment id (keeps segment ids
sorted) and send-list slot 0. The construction is one owner-sort pass over the
edges (src is CSR-sorted already) — no per-(p, q) full-edge scans.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from cuda_gcn_tpu.data.graph import (
    BLOCKED_RESID_MIN_NODES, BLOCKED_RESID_TARGET_BLK, BSR_DEFAULT_BUDGET_BYTES,
    BSR_DEFAULT_DTYPE, BSR_DEFAULT_TILE, _blocked2d_pack_multi, _np_dtype,
    _select_bsr_tiles, normalization_coefficients)
from cuda_gcn_tpu.data.parser import CSR


@dataclasses.dataclass
class PartitionedGraph:
    """Host-side (numpy) stacked per-part arrays; leading axis = part.

    Parts own VARIABLE node ranges ``[starts[p], starts[p+1])`` (balance-aware
    cuts, round 3); every SPMD shape stays uniform by padding each part's slab
    to ``block`` = the max range span. ``pad_nodes`` maps a global per-node
    array into the stacked [P*block] slab layout."""

    n_parts: int
    block: int              # B = owned-node slab rows per part (max span)
    n_nodes: int            # original (unpadded) node count
    emax: int               # edges per part (padded)
    # local COO per part, sorted by src; src in [0,B), dst in [0, B+halo_space)
    src: np.ndarray         # [P, Emax] int32
    dst: np.ndarray         # [P, Emax] int32
    coef: np.ndarray        # [P, Emax] float32
    # local transpose COO per part, sorted by t_src; t_src in [0, B+halo_space)
    t_src: np.ndarray       # [P, Emax] int32
    t_dst: np.ndarray       # [P, Emax] int32
    t_coef: np.ndarray      # [P, Emax] float32
    starts: np.ndarray = None  # (P,) int64 first global node id of each part
    # Offset-bucketed halo exchange (P-1 ppermute rounds): send_secs[k-1][q]
    # = block-local row ids device q ships to (q+k)%P in round k, padded to
    # the per-offset max hmax_k[k-1]; receiver p's halo buffer is the
    # concatenation of sections, section k starting at off_start[k-1].
    send_secs: list = None        # list of [P, hmax_k] int32
    hmax_k: tuple = ()            # per-offset halo slots
    off_start: np.ndarray = None  # (P,) int64 section starts (cumsum of hmax_k)
    halo_space: int = 1           # total halo rows per device (>= 1)
    # --- split view of the same edges, enabling comm/compute overlap:
    # interior edges (dst in own block), rows+cols in [0, B)
    i_src: np.ndarray = None    # [P, Eimax] int32 sorted
    i_dst: np.ndarray = None    # [P, Eimax] int32
    i_coef: np.ndarray = None   # [P, Eimax] float32
    it_src: np.ndarray = None   # [P, Eimax] transpose, sorted
    it_dst: np.ndarray = None
    it_coef: np.ndarray = None
    # boundary edges (dst in the halo buffer), rows in [0,B), cols in [0, P*hmax)
    b_src: np.ndarray = None    # [P, Ebmax] int32 sorted
    b_dst: np.ndarray = None    # [P, Ebmax] int32 (halo-buffer-local)
    b_coef: np.ndarray = None   # [P, Ebmax] float32
    bt_src: np.ndarray = None   # [P, Ebmax] transpose rows in [0, P*hmax), sorted
    bt_dst: np.ndarray = None   # [P, Ebmax] cols in [0, B)
    bt_coef: np.ndarray = None
    eimax: int = 0
    ebmax: int = 0
    # --- optional accelerated interior layouts (see parallel/sharded.py and
    # ops/graphsum.py RectGraph): dense MXU tiles of each part's square local
    # sub-adjacency + the 2D streaming residual layout for the interior residual.
    # When present, i_*/it_* above hold ONLY the interior residual edges.
    i_tiles: np.ndarray = None       # [P, Kmax, tb, tb]
    i_tile_rows: np.ndarray = None   # [P, Kmax] block-row ids, sorted per part
    i_tile_cols: np.ndarray = None   # [P, Kmax]
    tb: int = 0                      # tile size (0 = no tiles)
    i_nblocks: int = 0               # ceil(block / tb)
    # 2D-tiled interior residual (None = not built): flat bucketed piece list
    # (data/graph.py Blocked2DDev), one dict per size bucket with arrays
    # stacked [P, Pmax, ...] (uniform piece counts via dummy all-pad pieces)
    i_blk: list = None               # fwd pieces: [{r0, c0, flush, rows, cols, coef}]
    it_blk: list = None              # transpose pieces, same structure
    blk_rbw: int = 0                 # static accumulator-window rows (shared)
    blk_width: int = 0               # static gather-window width (shared)
    blk_n_pad8: int = 0              # static activation-table rows (shared)

    @property
    def n_local(self) -> int:
        """Size of each device's concatenated [own | halo] activation buffer."""
        return self.block + self.halo_space

    @property
    def padded_nodes(self) -> int:
        return self.n_parts * self.block

    @property
    def bounds(self) -> np.ndarray:
        """(P+1,) part node-range boundaries (starts + terminal n_nodes)."""
        return np.append(self.starts, self.n_nodes)

    def pad_nodes(self, arr: np.ndarray, fill=0) -> np.ndarray:
        """Lay a global per-node array out as the stacked [P*block] slab:
        part p's rows land at [p*block, p*block + span_p), the rest is
        ``fill`` (use fill=-1 for truth vectors so pad rows stay masked)."""
        out = np.full((self.padded_nodes,) + arr.shape[1:], fill, dtype=arr.dtype)
        b = self.bounds
        for p in range(self.n_parts):
            lo, hi = int(b[p]), int(b[p + 1])
            out[p * self.block: p * self.block + (hi - lo)] = arr[lo:hi]
        return out


def _stack_blocked2d(fwd_resid, bwd_resid, block: int, blocked_blk: int) -> dict:
    """Flat-piece-pack each part's interior residual (fwd + transpose) with
    SHARED static geometry (data/graph.py _blocked2d_pack_multi) and stack the
    per-bucket piece arrays to uniform [P, Pmax, cap] shapes (SPMD needs one
    static program). Parts with fewer pieces in a bucket are padded with dummy
    all-pad pieces (flush=False, coef 0 — they add zeros to whatever window is
    current, in both apply formulations)."""
    packed = _blocked2d_pack_multi(fwd_resid + bwd_resid, block, blocked_blk)
    if packed is None:
        return {}
    per_part, rbw, width, n_pad8, caps = packed
    n = len(fwd_resid)
    out = {"blk_rbw": int(rbw), "blk_width": int(width),
           "blk_n_pad8": int(n_pad8)}
    for name, parts in (("i_blk", per_part[:n]), ("it_blk", per_part[n:])):
        buckets = []
        for cap in caps:
            pmax = max((b["rows"].shape[0] for p in parts
                        if (b := p.get(cap)) is not None), default=0)
            if pmax == 0:
                continue
            # preserve the per-part COMPACT dtypes (int16 rows / uint16 cols,
            # data/graph._blocked2d_materialize) instead of upcasting to
            # int32/f32: the apply upcasts per scan step anyway, and the
            # stacked layout is what actually lives in HBM — int32 stacking
            # cost 2x the auto_tile_budget's (4+act) B/slot residual reserve
            proto = next(b for p in parts if (b := p.get(cap)) is not None)
            stacked = dict(
                r0=np.zeros((n, pmax), np.int32),
                c0=np.zeros((n, pmax), np.int32),
                flush=np.zeros((n, pmax), bool),
                rows=np.full((n, pmax, cap), rbw, proto["rows"].dtype),
                cols=np.zeros((n, pmax, cap), proto["cols"].dtype),
                coef=np.zeros((n, pmax, cap), proto["coef"].dtype))
            for p, part in enumerate(parts):
                b = part.get(cap)
                if b is None:
                    continue
                k = b["rows"].shape[0]
                for key in stacked:
                    stacked[key][p, :k] = b[key]
            buckets.append(stacked)
        out[name] = buckets
    return out


def partition_cuts(indptr: np.ndarray, n_parts: int, balance: str = "edges",
                   cluster_sizes: np.ndarray | None = None,
                   snap_slack_frac: float = 0.08) -> np.ndarray:
    """Choose the P node-range cut points (part p owns [cuts[p], cuts[p+1])).

    ``balance='nodes'``: the round-1/2 fixed equal-node blocks. Weakness
    (VERDICT round-2 weak #4): on power-law graphs they slice through the LPA
    cluster tail — at 16x-reddit P=8 the tail parts carried 2x the boundary
    fraction and edge balance hit 1.16, so the slowest part set the pace.

    ``balance='edges'`` (default): cuts at per-part EDGE-count quantiles
    (variable node ranges, edge balance ~1.0 by construction), each cut then
    snapped to the nearest LPA cluster boundary when that moves fewer than
    ``snap_slack_frac`` of a part's edges — a cut on a community boundary
    turns intra-cluster edges back into interior edges (SURVEY.md §7 hard
    part #3)."""
    n = len(indptr) - 1
    assert n >= n_parts, f"cannot cut {n} nodes into {n_parts} parts"
    if balance == "nodes" or n_parts == 1:
        block = -(-n // n_parts)
        return np.arange(n_parts, dtype=np.int64) * block
    cum = indptr.astype(np.int64)  # indptr IS the cumulative edge count
    m = int(cum[-1])
    targets = (np.arange(1, n_parts) * m) // n_parts
    interior = np.searchsorted(cum, targets, side="left").astype(np.int64)
    if cluster_sizes is not None and len(cluster_sizes) > 1:
        bnds = np.cumsum(np.asarray(cluster_sizes, dtype=np.int64))[:-1]
        slack = snap_slack_frac * m / n_parts
        snapped = []
        for c in interior:
            j = int(np.searchsorted(bnds, c))
            cands = [int(bnds[k]) for k in (j - 1, j) if 0 <= k < len(bnds)]
            best = min(cands, key=lambda b: abs(int(cum[b]) - int(cum[c])),
                       default=int(c))
            snapped.append(best if abs(int(cum[best]) - int(cum[c])) <= slack
                           else int(c))
        interior = np.asarray(snapped, dtype=np.int64)
    interior = np.clip(interior, 1, n - 1)
    interior = np.maximum.accumulate(interior)
    for i in range(1, len(interior)):  # dedupe degenerate collisions
        if interior[i] <= interior[i - 1]:
            interior[i] = interior[i - 1] + 1
    # collisions pushed forward can overrun n-1 (e.g. a giant hub near the
    # end of the id space pulls several edge-quantile targets into one node);
    # push back from the end so every part keeps >=1 node — a duplicate cut
    # means an empty part, which silently drops the blocked interior layout
    # for EVERY part (_blocked2d_pack_multi is all-or-nothing)
    for i in range(len(interior) - 1, -1, -1):
        cap_i = n - (len(interior) - i)
        if interior[i] > cap_i:
            interior[i] = cap_i
    return np.concatenate([[0], interior])


def partition_graph(csr: CSR, n_parts: int, interior_tiles: bool = False,
                    bsr_tile: int = BSR_DEFAULT_TILE,
                    bsr_min_edges: int | None = None,
                    bsr_budget_bytes: int | None = BSR_DEFAULT_BUDGET_BYTES,
                    bsr_dtype: str = BSR_DEFAULT_DTYPE,
                    blocked_blk: int = BLOCKED_RESID_TARGET_BLK,
                    blocked_min_nodes: int = BLOCKED_RESID_MIN_NODES,
                    balance: str = "edges",
                    cluster_sizes: np.ndarray | None = None,
                    cuts: np.ndarray | None = None) -> PartitionedGraph:
    """Partition a parsed adjacency CSR (self-loops included) into n_parts
    node-range parts (cut selection: ``partition_cuts``).

    With ``interior_tiles``, each part's square interior sub-adjacency gets the
    single-chip 'bsr' treatment (data/graph.py): its densest [tb, tb] blocks
    become dense MXU tiles (uniformly padded to the max tile count across
    parts), and the interior residual gets the 2D streaming layout when
    the part block is large enough. The per-part tile budget is the global
    budget / n_parts."""
    n = csr.nrows
    indptr = csr.indptr.astype(np.int64)
    indices = csr.indices.astype(np.int64)
    coef = normalization_coefficients(indptr, indices)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    dst = indices

    if cuts is not None:  # caller-chosen cuts (e.g. reorder.partition_aware_order)
        starts = np.asarray(cuts, dtype=np.int64)
        assert len(starts) == n_parts and starts[0] == 0
        # a duplicate cut = an empty part, which silently degrades EVERY
        # part to the segment fallback (_blocked2d_pack_multi is
        # all-or-nothing) — fail loudly instead
        assert (np.diff(np.append(starts, n)) > 0).all(), \
            f"cuts must leave every part >=1 node, got {starts} for n={n}"
    else:
        starts = partition_cuts(indptr, n_parts, balance, cluster_sizes)
    bounds = np.append(starts, n)
    block = int((bounds[1:] - bounds[:-1]).max())  # uniform SPMD slab rows

    # --- halo needs, ONE owner-sort pass: src is CSR-sorted so each part's
    # edges are a contiguous slice (no O(P^2) full-edge boolean scans — the
    # round-1 partitioner rescanned all edges per (p, q) pair); per part, one
    # unique over (dst_owner, dst) yields every peer's needed list at once.
    d_owner = np.searchsorted(starts, dst, side="right") - 1
    band_st = np.searchsorted(src, starts)
    band_en = np.append(band_st[1:], len(src))
    needed: dict[tuple[int, int], np.ndarray] = {}
    for p in range(n_parts):
        sl = slice(int(band_st[p]), int(band_en[p]))
        do_p, d_p = d_owner[sl], dst[sl]
        mask = do_p != p
        if mask.any():
            enc = np.unique(do_p[mask] * np.int64(n + 1) + d_p[mask])
            owners = enc // (n + 1)
            dsts = enc % (n + 1)
            st = np.searchsorted(owners, np.arange(n_parts + 1))
            for q in range(n_parts):
                if st[q + 1] > st[q]:
                    needed[(p, q)] = dsts[st[q]:st[q + 1]]

    # --- offset-bucketed halo sections: the exchange runs as P-1 ppermute
    # rounds; in round k device q ships rows to (q + k) % P. Each section is
    # sized to the max need over receivers AT THAT OFFSET, so total all-to-all
    # volume tracks per-offset structure instead of the single worst (p, q)
    # pair (round-1 weakness: one hub-heavy pair inflated every peer's send).
    hmax_k = tuple(
        max(max((len(needed.get((p, (p - k) % n_parts), ()))
                 for p in range(n_parts)), default=0), 1)
        for k in range(1, n_parts))
    off_start = np.concatenate([[0], np.cumsum(hmax_k, dtype=np.int64)])
    halo_space = max(int(off_start[-1]), 1)
    send_secs = []
    for k in range(1, n_parts):
        sec = np.zeros((n_parts, hmax_k[k - 1]), dtype=np.int32)
        for q in range(n_parts):
            ids = needed.get(((q + k) % n_parts, q))  # q sends to q + k
            if ids is not None:
                sec[q, : len(ids)] = (ids - starts[q]).astype(np.int32)
        send_secs.append(sec)

    # --- per-part local edge lists with halo-remapped dst
    n_local = block + halo_space
    counts = band_en - band_st
    emax = max(int(counts.max()), 1)

    src_l = np.full((n_parts, emax), block - 1, dtype=np.int32)
    dst_l = np.zeros((n_parts, emax), dtype=np.int32)
    coef_l = np.zeros((n_parts, emax), dtype=np.float32)
    t_src_l = np.full((n_parts, emax), n_local - 1, dtype=np.int32)
    t_dst_l = np.zeros((n_parts, emax), dtype=np.int32)
    t_coef_l = np.zeros((n_parts, emax), dtype=np.float32)

    for p in range(n_parts):
        sl = slice(int(band_st[p]), int(band_en[p]))
        s = (src[sl] - starts[p]).astype(np.int32)
        d_glob = dst[sl]
        c = coef[sl]
        d_own = d_owner[sl]
        # local id: own block rows directly; halo rows land in their sender's
        # ring-offset section at their position in needed[(p, q)]
        d_loc = np.empty(len(d_glob), dtype=np.int32)
        own = d_own == p
        d_loc[own] = (d_glob[own] - starts[p]).astype(np.int32)
        for q in np.unique(d_own[~own]):
            m = d_own == q
            k_off = (p - q) % n_parts
            pos = np.searchsorted(needed[(p, q)], d_glob[m])
            d_loc[m] = (block + off_start[k_off - 1] + pos).astype(np.int32)
        k = len(s)
        src_l[p, :k], dst_l[p, :k], coef_l[p, :k] = s, d_loc, c  # already src-sorted (CSR order)
        # transpose: rows = local dst ids, sorted
        perm = np.argsort(d_loc, kind="stable")
        t_src_l[p, :k] = d_loc[perm]
        t_dst_l[p, :k] = s[perm]
        t_coef_l[p, :k] = c[perm]

    # --- split interior/boundary edge lists (for the overlapped halo layer)
    int_counts = np.zeros(n_parts, dtype=np.int64)
    bnd_counts = np.zeros(n_parts, dtype=np.int64)
    per_part = []
    for p in range(n_parts):
        k = int(counts[p])
        s, d, c = src_l[p, :k], dst_l[p, :k], coef_l[p, :k]
        interior = d < block
        per_part.append((s, d, c, interior))
        int_counts[p] = int(interior.sum())
        bnd_counts[p] = k - int_counts[p]

    # --- optional: per-part dense tiles of the interior; i_* keep the residual
    tile_kwargs: dict = {}
    interior_resid = None
    if interior_tiles:
        from cuda_gcn_tpu.data.graph import resolve_tile_budget

        dtype = _np_dtype(bsr_dtype)
        if bsr_budget_bytes is None:
            # per-part budget models one device holding one part, but the
            # STACKED total is also capped at a single device's budget: on
            # virtual meshes (and device_put staging) all P parts coexist in
            # one memory — real pods wanting the full P x HBM can pass an
            # explicit budget
            per_ideal = resolve_tile_budget(block, len(src) // n_parts,
                                            bsr_tile, dtype, bsr_min_edges)
            single_dev = resolve_tile_budget(n, len(src), bsr_tile, dtype,
                                             bsr_min_edges)
            bsr_budget_bytes = min(n_parts * per_ideal, max(single_dev, per_ideal))
        per_budget = max(bsr_budget_bytes // n_parts, bsr_tile * bsr_tile * dtype.itemsize)
        tiles_pp, interior_resid = [], []
        i_nblocks = -(-block // bsr_tile)
        for p in range(n_parts):
            s, d, c, interior = per_part[p]
            si, di, ci = s[interior].astype(np.int64), d[interior].astype(np.int64), c[interior]
            # duplicate-edge check enables the fast scatter-assign tile build
            # (and the native bf16 kernel) — cf. build_graph's unique_edges
            ekey = si * np.int64(block) + di
            ekey_sorted = np.sort(ekey)
            uniq = not bool(np.any(ekey_sorted[1:] == ekey_sorted[:-1]))
            (tiles, trows, tcols, _, _), keep = _select_bsr_tiles(
                si, di, ci, block, bsr_tile, bsr_min_edges, per_budget, dtype,
                unique_edges=uniq)
            tiles_pp.append((tiles, trows, tcols))
            interior_resid.append((si[keep].astype(np.int32),
                                   di[keep].astype(np.int32), ci[keep]))
            int_counts[p] = len(interior_resid[-1][0])
        kmax = max(max(len(t[1]) for t in tiles_pp), 1)
        i_tiles = np.zeros((n_parts, kmax, bsr_tile, bsr_tile), dtype=dtype)
        # Pad tile-row ids with the LAST block id, not 0: real rows are sorted
        # ascending and _tile_contract declares indices_are_sorted=True on the
        # forward segment_sum — a 0 pad after sorted rows would break that
        # invariant (pad tiles are all-zero, so they add 0 to the last segment).
        i_tile_rows = np.full((n_parts, kmax), i_nblocks - 1, dtype=np.int32)
        i_tile_cols = np.zeros((n_parts, kmax), dtype=np.int32)
        for p, (tiles, trows, tcols) in enumerate(tiles_pp):
            kk = len(trows)
            i_tiles[p, :kk] = tiles
            i_tile_rows[p, :kk] = trows
            i_tile_cols[p, :kk] = tcols
        tile_kwargs = dict(i_tiles=i_tiles, i_tile_rows=i_tile_rows,
                           i_tile_cols=i_tile_cols, tb=bsr_tile, i_nblocks=i_nblocks)

    eimax = max(int(int_counts.max()), 1)
    ebmax = max(int(bnd_counts.max()), 1)

    i_src = np.full((n_parts, eimax), block - 1, dtype=np.int32)
    i_dst = np.zeros((n_parts, eimax), dtype=np.int32)
    i_coef = np.zeros((n_parts, eimax), dtype=np.float32)
    it_src = np.full((n_parts, eimax), block - 1, dtype=np.int32)
    it_dst = np.zeros((n_parts, eimax), dtype=np.int32)
    it_coef = np.zeros((n_parts, eimax), dtype=np.float32)
    b_src = np.full((n_parts, ebmax), block - 1, dtype=np.int32)
    b_dst = np.zeros((n_parts, ebmax), dtype=np.int32)
    b_coef = np.zeros((n_parts, ebmax), dtype=np.float32)
    bt_src = np.full((n_parts, ebmax), halo_space - 1, dtype=np.int32)
    bt_dst = np.zeros((n_parts, ebmax), dtype=np.int32)
    bt_coef = np.zeros((n_parts, ebmax), dtype=np.float32)

    fwd_resid, bwd_resid = [], []
    for p in range(n_parts):
        s, d, c, interior = per_part[p]
        if interior_resid is not None:
            si, di, ci = interior_resid[p]
        else:
            si, di, ci = s[interior], d[interior], c[interior]
        ki = len(si)
        i_src[p, :ki], i_dst[p, :ki], i_coef[p, :ki] = si, di, ci  # src-sorted
        perm = np.argsort(di, kind="stable")
        it_src[p, :ki], it_dst[p, :ki], it_coef[p, :ki] = di[perm], si[perm], ci[perm]
        fwd_resid.append((si, di, ci))
        bwd_resid.append((di[perm], si[perm], ci[perm]))

        sb, db, cb = s[~interior], d[~interior] - block, c[~interior]
        kb = len(sb)
        b_src[p, :kb], b_dst[p, :kb], b_coef[p, :kb] = sb, db, cb
        perm = np.argsort(db, kind="stable")
        bt_src[p, :kb], bt_dst[p, :kb], bt_coef[p, :kb] = db[perm], sb[perm], cb[perm]

    # --- optional: 2D streaming layout for the interior residual
    blk_kwargs: dict = {}
    if interior_tiles and block >= blocked_min_nodes:
        blk_kwargs = _stack_blocked2d(fwd_resid, bwd_resid, block, blocked_blk)

    return PartitionedGraph(
        n_parts=n_parts, block=block, n_nodes=n, emax=emax, starts=starts,
        hmax_k=hmax_k, off_start=off_start.astype(np.int64),
        halo_space=halo_space,
        src=src_l, dst=dst_l, coef=coef_l,
        t_src=t_src_l, t_dst=t_dst_l, t_coef=t_coef_l,
        send_secs=send_secs,
        i_src=i_src, i_dst=i_dst, i_coef=i_coef,
        it_src=it_src, it_dst=it_dst, it_coef=it_coef,
        b_src=b_src, b_dst=b_dst, b_coef=b_coef,
        bt_src=bt_src, bt_dst=bt_dst, bt_coef=bt_coef,
        eimax=eimax, ebmax=ebmax,
        **tile_kwargs, **blk_kwargs,
    )

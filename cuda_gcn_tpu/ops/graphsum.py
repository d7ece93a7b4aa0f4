"""GraphSum: out = Â·H — aggregation over the symmetrically-normalized adjacency.

TPU-native replacement for the reference's GraphSum CPU loops (src/seq/module.cpp:83-119)
and CUDA kernels (src/cuda/cuda_kernel.cu:126-162). The reference gathers
``out[src] += coef * in[dst]`` per CSR edge and recomputes ``coef`` per pass; we
consume precomputed coefficients (see data/graph.py) and pick among backends:

* ``segment`` — sorted gather + ``jax.ops.segment_sum``; the oracle backend. Both
  directions run over *sorted* segment ids because the Graph carries the transpose
  edge ordering, so the backward never hits an unsorted scatter.
* ``ell``     — bucketed-ELL gather-scan: per degree bucket, a static scan of
  vectorized row gathers with register accumulation; NO scatter anywhere (bucket
  rows are disjoint, results merge by `.at[rows].set`). Best for large power-law
  graphs on TPU where scatters serialize.
* ``pallas``  — hand-written Pallas SpMM kernel over the same ELL packing
  (ops/pallas_spmm.py).
* ``dense``   — Â materialized [N,N]; one MXU matmul. Fastest for small graphs
  (cora/citeseer-scale) where N² fits comfortably in HBM.

The backward pass is wired by custom VJP: d/dH (Â·H) applied to cotangent G is
Âᵀ·G, computed with the same machinery over the precomputed transpose layout
(valid for any graph, not just symmetric Â — the reference relies on symmetry,
module.cpp:95 comment).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from cuda_gcn_tpu.data.graph import Graph

# ELL buckets whose width exceeds this are processed with a lax.scan over
# width-chunks; narrower buckets use a single batched gather.
_ELL_CHUNK = 8


def _segment_apply(h, rows, cols, coef, n):
    vals = h[cols] * coef[:, None].astype(h.dtype)
    return jax.ops.segment_sum(vals, rows, num_segments=n, indices_are_sorted=True)


def _ell_bucket_apply(h, bucket):
    """Aggregate one ELL bucket: rows (R,), cols (R,W), coef (R,W) -> (R, d)."""
    r, w = bucket.cols.shape
    if w <= _ELL_CHUNK:
        gathered = h[bucket.cols]  # (R, W, d)
        return jnp.sum(gathered * bucket.coef[..., None].astype(h.dtype), axis=1)
    # chunked scan: widths are powers of two >= _ELL_CHUNK, so this divides evenly
    num_chunks = w // _ELL_CHUNK
    cols = bucket.cols.reshape(r, num_chunks, _ELL_CHUNK).transpose(1, 0, 2)
    coef = bucket.coef.reshape(r, num_chunks, _ELL_CHUNK).transpose(1, 0, 2)

    def step(acc, chunk):
        c_cols, c_coef = chunk
        gathered = h[c_cols]  # (R, CHUNK, d)
        return acc + jnp.sum(gathered * c_coef[..., None].astype(h.dtype), axis=1), None

    init = jnp.zeros((r, h.shape[1]), h.dtype)
    acc, _ = jax.lax.scan(step, init, (cols, coef))
    return acc


def _ell_apply(h, buckets, n):
    out = jnp.zeros((n, h.shape[1]), h.dtype)
    for bucket in buckets:
        out = out.at[bucket.rows].set(_ell_bucket_apply(h, bucket))
    return out


# Per-piece accumulator-update formulation for the flat 2D residual (same
# layout, two device programs): 'rmw' (default) re-reads/writes the [rbw, d]
# window every piece — cond-free, and with pieces sized >=4 band spans the
# window traffic is a few percent; 'carry' holds the window in the scan carry
# and flushes on band transitions via lax.cond — ~10% faster per edge on
# skewed residuals, but the cond TRIPLES the fused-loop compile time on this
# toolchain (reddit warmup 736 s vs 249 s) and cost ~13% end-to-end runtime.
# Chip-measured comparison: docs/PERF.md "flat piece list".
_BLOCKED2D_IMPL = os.environ.get("CUDA_GCN_TPU_BLOCKED2D_IMPL", "rmw")


def _piece_part(hp, w, rbw, c0, r, c, wgt, dtype):
    """One piece's contribution: gather from the [c0, c0+w) window of the
    activation table (~4 ns/row at <=32 MB windows, docs/PERF.md) and reduce
    into a SMALL [rbw+1, d] sorted segment-sum — never the full [n, d] output,
    which is the >=75 ns/edge materialization cliff at ~1M-row outputs
    (docs/PERF.md "segment-output cliff"). Pad lanes land in local segment
    ``rbw`` (dropped); accumulation is f32 regardless of activation dtype."""
    sub = jax.lax.dynamic_slice_in_dim(hp, c0, w)
    # piece indices are stored 16-bit (PieceBucket compaction); upcast the
    # [cap]-sized transient for the gather/segment ops
    c = c.astype(jnp.int32)
    r = r.astype(jnp.int32)
    vals = sub[c] * wgt[:, None].astype(dtype)
    part = jax.ops.segment_sum(vals.astype(jnp.float32), r,
                               num_segments=rbw + 1, indices_are_sorted=True)
    return part[:rbw]


def _piece_scan(hp, acc, bk, rbw, w, dtype):
    """Scan one PieceBucket's pieces into the accumulator (see _BLOCKED2D_IMPL)."""
    xs = (bk.r0, bk.c0, bk.flush, bk.rows, bk.cols, bk.coef)
    if _BLOCKED2D_IMPL == "rmw":
        def step(acc, x):
            r0, c0, _, r, c, wgt = x
            part = _piece_part(hp, w, rbw, c0, r, c, wgt, dtype)
            win = jax.lax.dynamic_slice_in_dim(acc, r0, rbw) + part
            return jax.lax.dynamic_update_slice_in_dim(acc, win, r0, 0), None

        acc, _ = jax.lax.scan(step, acc, xs)
        return acc

    win0 = jax.lax.dynamic_slice_in_dim(acc, bk.r0[0], rbw)

    def step(carry, x):
        acc, cur_r0, win = carry
        r0, c0, flush, r, c, wgt = x

        def do_flush(a, wn):
            a = jax.lax.dynamic_update_slice_in_dim(a, wn, cur_r0, 0)
            return a, jax.lax.dynamic_slice_in_dim(a, r0, rbw)

        acc, win = jax.lax.cond(flush, do_flush, lambda a, wn: (a, wn), acc, win)
        cur_r0 = jnp.where(flush, r0, cur_r0)
        part = _piece_part(hp, w, rbw, c0, r, c, wgt, dtype)
        return (acc, cur_r0, win + part), None

    (acc, last_r0, win), _ = jax.lax.scan(step, (acc, bk.r0[0], win0), xs)
    return jax.lax.dynamic_update_slice_in_dim(acc, win, last_r0, 0)


def _blocked2d_apply(h, b2, n):
    """Streaming residual aggregation over the flat bucketed piece list
    (data/graph.py Blocked2DDev): one lax.scan per size bucket, pieces ordered
    band-major so the accumulator window is loaded/flushed once per band (the
    'carry' impl) instead of per piece. Window starts are pre-clamped at pack
    time, so the activation table is never copied beyond 8-row alignment
    (VERDICT round-2 weak #6: the old apply jnp.pad'ed the whole ~GB table
    every pass)."""
    d = h.shape[1]
    rbw, w, n_pad8 = b2.rbw, b2.width, b2.n_pad8
    pad = n_pad8 - h.shape[0]
    hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
    # derive the zero carry from a graph leaf so its varying-axis type matches
    # the scanned operands under shard_map (coef is finite by construction)
    zero = (b2.buckets[0].coef[0, 0] * 0).astype(jnp.float32)
    acc = jnp.zeros((n_pad8, d), jnp.float32) + zero
    for bk in b2.buckets:
        acc = _piece_scan(hp, acc, bk, rbw, w, h.dtype)
    return acc[:n].astype(h.dtype)


# Above this tile count the batched tile einsum is chunked with a lax.scan so
# its [K, d, tb] f32 product intermediate stays bounded (~GB-scale graphs OOM
# otherwise; at 8192 tiles the chunk products are ~0.7 GB at d=82, tb=256);
# below it the single fused einsum is faster and memory is moot. reddit-1x
# (~22K tiles) stays on the fused path via the 32K engage threshold.
_TILE_EINSUM_CHUNK = 8192
_TILE_EINSUM_ENGAGE = 32768


def _tile_contract(tiles, rows, cols, hT, t_blocks, transpose):
    """outb[T, d, tb] = sum over tiles of tile x gathered-block products."""
    spec = "kji,dkj->kdi" if transpose else "kij,dkj->kdi"
    k = int(tiles.shape[0])
    if k <= _TILE_EINSUM_ENGAGE:
        hbT = hT[:, cols]
        prod = jnp.einsum(spec, tiles, hbT, preferred_element_type=jnp.float32)
        return jax.ops.segment_sum(prod, rows, num_segments=t_blocks,
                                   indices_are_sorted=not transpose)
    d, _, tb = hT.shape
    # NO padded copy of the tile array: at 4x-reddit scale the tiles are >11 GB
    # and jnp.pad would materialize a second full copy as an HLO temp (measured
    # OOM: 23.7 G demand on a 15.75 G chip). Full chunks reshape a contiguous
    # leading-dim slice (layout-compatible -> bitcast); the tail runs as one
    # smaller einsum.
    nch = k // _TILE_EINSUM_CHUNK
    head = nch * _TILE_EINSUM_CHUNK

    def contract(t, r, c):
        prod = jnp.einsum(spec, t, hT[:, c], preferred_element_type=jnp.float32)
        return jax.ops.segment_sum(prod, r, num_segments=t_blocks,
                                   indices_are_sorted=not transpose)

    zero = (rows[0] * 0).astype(jnp.float32)  # varying-aware zero (cf. _blocked2d_apply)
    acc = jnp.zeros((t_blocks, d, tb), jnp.float32) + zero
    if nch:
        # read each chunk with dynamic_slice INSIDE the scan body: a scanned-xs
        # formulation needs a [nch, CHUNK, ...] operand, and XLA materializes
        # both jnp.pad and even a zero-offset slice of the tile array as a
        # full-size HLO temp (measured 8-11 GB at 4x-reddit, OOM); per-step
        # dynamic slices bound the temp to one ~1 GB chunk
        def step(acc, i):
            t = jax.lax.dynamic_slice_in_dim(tiles, i * _TILE_EINSUM_CHUNK,
                                             _TILE_EINSUM_CHUNK)
            r = jax.lax.dynamic_slice_in_dim(rows, i * _TILE_EINSUM_CHUNK,
                                             _TILE_EINSUM_CHUNK)
            c = jax.lax.dynamic_slice_in_dim(cols, i * _TILE_EINSUM_CHUNK,
                                             _TILE_EINSUM_CHUNK)
            return acc + contract(t, r, c), None

        acc, _ = jax.lax.scan(step, acc, jnp.arange(nch))
    if k > head:
        acc = acc + contract(tiles[head:], rows[head:], cols[head:])
    return acc


# Engine for the dense-tile contraction, in the sorted (non-transpose)
# orientation: 'auto' (the default) picks per feature width between the XLA
# einsum+segment_sum and the Pallas pipeline using the chip-probe policy
# (pallas_bsr.preferred_variant; artifacts/exp_pallas_bsr.json), VERIFIED by
# an AOT compile with fallback blocked -> XLA so a Mosaic rejection at any
# dims degrades to the XLA path instead of killing the run (VERDICT r4 #1).
# End-to-end evidence for the default: reddit 100-epoch 27.33 s vs 29.10 s
# on the pinned XLA engine (artifacts/bench_reddit_100ep_r5.json). 'xla'
# pins the XLA path; 'pallas'/'resident'/'blocked' pin a kernel (off-TPU
# these run interpret mode — tests and probes only).
_TILE_ENGINE = os.environ.get("CUDA_GCN_TPU_TILE_ENGINE", "auto")


def _dense_tile_part(tiles, rows, cols, h, n, t_blocks, transpose):
    """Dense-tile contribution as [n, d] in h.dtype — the full layout round
    trip shared by the single-chip bsr backend and the sharded RectGraph
    interior, dispatching between the XLA and Pallas tile engines."""
    if _TILE_ENGINE != "xla" and not transpose and tiles.shape[0] > 0:
        from cuda_gcn_tpu.ops import pallas_bsr

        if _TILE_ENGINE in ("pallas", "resident", "blocked"):
            variant = "auto" if _TILE_ENGINE == "pallas" else _TILE_ENGINE
            return pallas_bsr.bsr_tile_contract(tiles, rows, cols, h, n,
                                                t_blocks, variant=variant)
        if pallas_bsr._on_tpu():  # 'auto': AOT-verified choice, 'xla' on reject
            k, tb = int(tiles.shape[0]), int(tiles.shape[1])
            variant = pallas_bsr.verified_variant(
                k, tb, t_blocks, pallas_bsr.padded_width(h.shape[1]),
                h.dtype, tiles.dtype)
            if variant != "xla":
                return pallas_bsr.bsr_tile_contract(tiles, rows, cols, h, n,
                                                    t_blocks, variant=variant)
    d, tb = h.shape[1], int(tiles.shape[1])
    hT = jnp.pad(h, ((0, t_blocks * tb - n), (0, 0))).T.reshape(d, t_blocks, tb)
    outb = _tile_contract(tiles, rows, cols, hT, t_blocks, transpose)
    return outb.transpose(1, 0, 2).reshape(d, t_blocks * tb)[:, :n].T.astype(h.dtype)


def resolved_tile_engine(graph: Graph, widths, dtype=jnp.float32) -> dict:
    """Resolve (and memoize) the tile engine the dispatch will take for each
    feature width at activation dtype ``dtype`` — called by train.prepare so
    the AOT verification never fires mid-trace, and by bench.py for the
    ``tile_engine`` detail field. Returns {width: 'xla'|'resident'|'blocked'}."""
    if graph.backend != "bsr" or graph.bsr_tiles is None or graph.bsr_tiles.shape[0] == 0:
        return {}
    from cuda_gcn_tpu.ops import pallas_bsr

    if _TILE_ENGINE == "xla" or (_TILE_ENGINE == "auto" and not pallas_bsr._on_tpu()):
        return {int(d): "xla" for d in widths}
    k, tb = int(graph.bsr_tiles.shape[0]), int(graph.bsr_tiles.shape[1])
    if _TILE_ENGINE in ("resident", "blocked"):
        return {int(d): _TILE_ENGINE for d in widths}
    if _TILE_ENGINE == "pallas":
        return {int(d): pallas_bsr.select_variant(
            k, tb, graph.bsr_nblocks, pallas_bsr.padded_width(d),
            jnp.dtype(dtype).itemsize, graph.bsr_tiles.dtype.itemsize)
            for d in widths}
    return pallas_bsr.warm_engine_cache(k, tb, graph.bsr_nblocks, widths,
                                        dtype, graph.bsr_tiles.dtype)


def _bsr_apply(h, graph: Graph, transpose: bool):
    """Block-sparse path: dense MXU tiles over contiguous node blocks + COO residual.

    Â (after locality reordering, data/reorder.py) concentrates most edges in a
    few dense [TB, TB] tiles (stored bf16 by default); those multiply as a
    batched einsum at full memory bandwidth — no per-edge gather. The residual
    edges use the sorted-segment path. The transpose reuses the SAME tile array
    with swapped contraction ('kij' -> 'kji') and swapped block row/col ids —
    zero extra tile memory, valid for any Â.

    All intermediates use the TRANSPOSED activation layout [d, K, tb]: TPU
    stores arrays lane-padded to 128, so a [K, tb, d] intermediate at d=16
    would occupy 8x its logical bytes (docs/PERF.md "lane padding"); keeping tb
    (a multiple of 128) as the minor dim makes every tensor dense in memory.
    """
    n = graph.n_nodes
    t_blocks = graph.bsr_nblocks
    rows, cols = (graph.bsr_cols, graph.bsr_rows) if transpose else (graph.bsr_rows, graph.bsr_cols)
    dense_part = _dense_tile_part(graph.bsr_tiles, rows, cols, h, n, t_blocks,
                                  transpose)
    blk = graph.blk_bwd if transpose else graph.blk_fwd
    ell = graph.ell_bwd if transpose else graph.ell_fwd
    if blk is not None:  # 2D-tiled streaming residual (large graphs)
        resid = _blocked2d_apply(h, blk, n)
    elif ell:  # scatter-free residual accumulation
        resid = _ell_apply(h, ell, n)
    elif transpose:
        resid = _segment_apply(h, graph.t_src, graph.t_dst, graph.t_coef, n)
    else:
        resid = _segment_apply(h, graph.src, graph.dst, graph.coef, n)
    return dense_part + resid


def _check_flat_coo(graph: Graph):
    from cuda_gcn_tpu.data.graph import require_flat_coo

    require_flat_coo(graph, f"backend '{graph.backend}'")


def _pallas_or_ell(h, buckets, graph: Graph):
    """Pallas ELL kernel when the activation table fits VMEM, else the XLA ELL
    path (same packing) — the fallback the kernel's docstring promises."""
    from cuda_gcn_tpu.ops.pallas_spmm import ell_spmm, fits_vmem

    if fits_vmem(graph.n_nodes, h.shape[1], h.dtype.itemsize):
        return ell_spmm(h, buckets, graph.n_nodes)
    return _ell_apply(h, buckets, graph.n_nodes)


def _forward(h, graph: Graph):
    if graph.backend == "bsr":
        return _bsr_apply(h, graph, transpose=False)
    _check_flat_coo(graph)
    if graph.backend == "dense":
        return jnp.dot(graph.adj.astype(h.dtype), h, preferred_element_type=h.dtype)
    if graph.backend == "ell":
        return _ell_apply(h, graph.ell_fwd, graph.n_nodes)
    if graph.backend == "pallas":
        return _pallas_or_ell(h, graph.ell_fwd, graph)
    return _segment_apply(h, graph.src, graph.dst, graph.coef, graph.n_nodes)


def _transpose_forward(g, graph: Graph):
    """Âᵀ·G. Symmetric graphs (undirected input + pair-closed tile set,
    data/graph.build_graph) satisfy Â = Âᵀ as an operator, so the backward IS
    the forward — one set of device structures serves both directions, and no
    transpose layout is ever built or shipped (build_graph leaves t_*/blk_bwd/
    ell_bwd empty). Asymmetric graphs run over the precomputed transpose."""
    if graph.symmetric:
        return _forward(g, graph)
    if graph.backend == "bsr":
        return _bsr_apply(g, graph, transpose=True)
    _check_flat_coo(graph)
    if graph.backend == "dense":
        return jnp.dot(graph.adj.T.astype(g.dtype), g, preferred_element_type=g.dtype)
    if graph.backend == "ell":
        return _ell_apply(g, graph.ell_bwd, graph.n_nodes)
    if graph.backend == "pallas":
        return _pallas_or_ell(g, graph.ell_bwd, graph)
    return _segment_apply(g, graph.t_src, graph.t_dst, graph.t_coef, graph.n_nodes)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RectGraph:
    """A rectangular sparse aggregation operator: out[N_out, d] = A · h[N_in, d]
    with A given as sorted COO plus its precomputed (sorted) transpose.

    Used by the sharded halo-exchange layer, where the interior aggregation
    (own-block rows × own-block columns) and the boundary aggregation
    (own-block rows × halo-buffer columns) are separate operators so XLA can
    overlap the halo ``all_to_all`` with the interior work (SURVEY.md §5
    "overlap halo exchange with local aggregation").

    The square interior operator optionally carries the same accelerated
    layouts as the single-chip 'bsr' backend (data/graph.py): dense MXU tiles
    over the densest [tb, tb] blocks of the local sub-adjacency (the COO
    fields then hold only residual edges) and the 2D streaming residual layout
    for the residual. Tiles require n_out == n_in (square local block); the
    transpose pass reuses the SAME tile array with swapped contraction."""

    rows: jnp.ndarray    # (nnz,) int32, sorted
    cols: jnp.ndarray    # (nnz,) int32 into [0, n_in)
    coef: jnp.ndarray    # (nnz,) float32
    t_rows: jnp.ndarray  # (nnz,) int32, sorted, into [0, n_in)
    t_cols: jnp.ndarray  # (nnz,) int32 into [0, n_out)
    t_coef: jnp.ndarray  # (nnz,) float32
    tiles: jnp.ndarray | None = None      # [K, tb, tb] dense tile values
    tile_rows: jnp.ndarray | None = None  # [K] block-row ids (sorted)
    tile_cols: jnp.ndarray | None = None  # [K] block-col ids
    blk_fwd: "object | None" = None       # Blocked2DDev for the residual
    blk_bwd: "object | None" = None
    n_out: int = 0
    n_in: int = 0
    tb: int = 0          # static tile size (0 = no tiles)
    nblocks: int = 0     # static ceil(padded n / tb)

    def tree_flatten(self):
        return ((self.rows, self.cols, self.coef,
                 self.t_rows, self.t_cols, self.t_coef,
                 self.tiles, self.tile_rows, self.tile_cols,
                 self.blk_fwd, self.blk_bwd),
                (self.n_out, self.n_in, self.tb, self.nblocks))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (rows, cols, coef, t_rows, t_cols, t_coef,
         tiles, tile_rows, tile_cols, blk_fwd, blk_bwd) = leaves
        return cls(rows, cols, coef, t_rows, t_cols, t_coef,
                   tiles=tiles, tile_rows=tile_rows, tile_cols=tile_cols,
                   blk_fwd=blk_fwd, blk_bwd=blk_bwd,
                   n_out=aux[0], n_in=aux[1], tb=aux[2], nblocks=aux[3])


def _rect_tile_apply(h, rg: RectGraph, transpose: bool):
    """Dense-tile contribution for a square RectGraph (same transposed-layout
    einsum as the single-chip bsr backend, _bsr_apply)."""
    rows, cols = ((rg.tile_cols, rg.tile_rows) if transpose
                  else (rg.tile_rows, rg.tile_cols))
    return _dense_tile_part(rg.tiles, rows, cols, h, rg.n_out, rg.nblocks,
                            transpose)


def _rect_apply(h, rg: RectGraph, transpose: bool):
    if transpose:
        rows, cols, coef, n, blk = rg.t_rows, rg.t_cols, rg.t_coef, rg.n_in, rg.blk_bwd
    else:
        rows, cols, coef, n, blk = rg.rows, rg.cols, rg.coef, rg.n_out, rg.blk_fwd
    if blk is not None:
        out = _blocked2d_apply(h, blk, n)
    else:
        out = _segment_apply(h, rows, cols, coef, n)
    if rg.tiles is not None and rg.tiles.shape[0] > 0:
        out = out + _rect_tile_apply(h, rg, transpose)
    return out


@jax.custom_vjp
def rect_graphsum(h: jnp.ndarray, rg: RectGraph) -> jnp.ndarray:
    """out[n_out, d] = A · h for h of shape [n_in, d]."""
    return _rect_apply(h, rg, transpose=False)


def _rect_fwd(h, rg):
    return _rect_apply(h, rg, transpose=False), rg


def _rect_bwd(rg, g):
    dh = _rect_apply(g, rg, transpose=True)
    return dh, _zero_cotangent(rg)


def _zero_cotangent(tree):
    def zero(x):
        if x is None:
            return None
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)

    return jax.tree_util.tree_map(zero, tree)


@jax.custom_vjp
def graphsum(h: jnp.ndarray, graph: Graph) -> jnp.ndarray:
    """out = Â·H for H of shape [N, d]."""
    return _forward(h, graph)


def _graphsum_fwd(h, graph):
    return _forward(h, graph), graph


def _graphsum_bwd(graph, g):
    return _transpose_forward(g, graph), _zero_cotangent(graph)


graphsum.defvjp(_graphsum_fwd, _graphsum_bwd)
rect_graphsum.defvjp(_rect_fwd, _rect_bwd)


@jax.custom_vjp
def _graphsum_pair_prim(zt: jnp.ndarray, ze: jnp.ndarray, graph: Graph):
    d = zt.shape[1]
    both = _forward(jnp.concatenate([zt, ze], axis=1), graph)
    return both[:, :d], both[:, d:]


def _pair_fwd(zt, ze, graph):
    return _graphsum_pair_prim(zt, ze, graph), graph


def _pair_bwd(graph, gs):
    g_t, _ = gs  # the eval half's cotangent is zero by contract (see graphsum_pair)
    dzt = _transpose_forward(g_t, graph)
    return dzt, jnp.zeros((graph.n_nodes, gs[1].shape[1]), gs[1].dtype), _zero_cotangent(graph)


_graphsum_pair_prim.defvjp(_pair_fwd, _pair_bwd)


def graphsum_pair(zt: jnp.ndarray, ze: jnp.ndarray, graph: Graph):
    """(Â·zt, stop_gradient(Â·ze)) in ONE width-concatenated adjacency pass.

    The fused train+eval forward (models/gcn.apply_pair) aggregates the
    training activations and the no-dropout eval activations together because
    graphsum is linear and the per-edge gathers are width-independent
    (docs/PERF.md). Routing the concatenation through plain ``graphsum`` made
    the BACKWARD pass run at the concatenated width too — Âᵀ·[g | 0] with the
    eval half's cotangent identically zero (it only ever feeds undifferentiated
    val metrics). At reddit dims the layer-2 backward aggregated [N, 82]
    instead of [N, 41]: 2× the MXU tile work, and a 2×-wide f32 streaming
    accumulator that the 16x OOM dump shows as ~6 GB of remat copies
    (f32[3.7M, 82], /tmp/bench16x.log). This primitive keeps the fused forward
    but differentiates only the train half, so the transpose pass runs at
    train width. The eval output is stop_gradient'ed to make the contract
    explicit (differentiating it returns zeros, exactly as if the caller had
    written ``stop_gradient(graphsum(ze, graph))`` — which is the semantics,
    minus the second adjacency pass).
    """
    out_t, out_e = _graphsum_pair_prim(zt, jax.lax.stop_gradient(ze), graph)
    return out_t, jax.lax.stop_gradient(out_e)

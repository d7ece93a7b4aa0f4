"""Feature-transform matmuls: dense (MXU) and sparse-CSR (reference-parity) paths.

The reference computes the layer-1 transform X·W with a hand-rolled CSR SpMM over
the sparse feature matrix (src/seq/module.cpp:47-77; CUDA kernels
src/cuda/cuda_kernel.cu:100-122 — whose backward scatter has a cross-block data
race the TPU build cannot reproduce by construction), and the layer-2 transform
with a triple-loop dense GEMM (module.cpp:11-42; tiled CUDA kernels
cuda_kernel.cu:6-96).

TPU-first defaults:
* ``dense_matmul`` — one ``jnp.dot`` on the MXU; used for both layers once the
  feature matrix is densified (cora X ≈ 15 MB, reddit X ≈ 561 MB — both fine in HBM).
* ``csr_matmul``  — X kept as CSR values: out = segment_sum(vals·W[cols], rows).
  Provided for parity with the reference's SparseMatmul and for feature matrices
  too sparse/wide to densify. Gradients flow to the nnz values (matching the
  reference, where only ``b`` gets a gradient and the value gradient exists only
  through the input-dropout mask path).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseFeatures:
    """CSR feature matrix kept sparse on device (reference SparseIndex+values,
    src/seq/sparse.h:7-17): the model's layer-0 input when
    ``GCNConfig.feature_matmul == 'sparse'``. Dropout applies to ``values``
    exactly like the reference's layer-0 dropout on nnz values (gcn.cpp:23)."""

    values: jnp.ndarray  # (nnz,) float
    rows: jnp.ndarray    # (nnz,) int32, sorted (CSR expansion)
    cols: jnp.ndarray    # (nnz,) int32
    n_rows: int
    n_cols: int

    def tree_flatten(self):
        return (self.values, self.rows, self.cols), (self.n_rows, self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, n_rows=aux[0], n_cols=aux[1])


def dense_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[N, F] @ [F, H] on the MXU with fp32 accumulation."""
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def csr_matmul(values: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
               w: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """CSR-values SpMM: out[i] = sum_{nnz j in row i} values[j] * W[cols[j], :].

    ``rows`` must be sorted ascending (CSR expansion). Autodiff gives:
    dW = scatter-add over cols (the op the reference races on, cuda_kernel.cu:112-122),
    dvalues = <W[cols], g[rows]> — both correct by construction here.
    """
    gathered = w[cols] * values[:, None].astype(w.dtype)
    return jax.ops.segment_sum(gathered, rows, num_segments=n_rows, indices_are_sorted=True)


# -- banded sparse layer-0 for huge graphs ----------------------------------
#
# csr_matmul's segment_sum reduces into an [n_rows, d] output; at >=1M rows
# XLA's gather+segment pipeline scalarizes (~4.5 ns per edge*element — the
# same measured cliff the graphsum Blocked2DDev layout exists for,
# docs/PERF.md "segment-output cliff"), and the [nnz, d] gathered
# intermediate alone is ~4.2 GB at the 16x-reddit feature matrix (65M nnz).
# The banded layout slices the CSR expansion into fixed row bands of
# FEAT_BAND_ROWS rows and scans them: each band segments <=Emax edges into a
# small [rbw+1, d] output (pad rows land in segment rbw, dropped), so the
# per-step temps are bounded and the segment output never leaves the fast
# regime. The within-band column-sorted permutation (t_idx) gives the
# dW backward a SORTED small-output segment reduction too — never the
# unsorted scatter the reference races on (src/cuda/cuda_kernel.cu:112-122).

FEAT_BAND_ROWS = 16384           # rbw: same band span the graphsum windows use
BANDED_FEATURES_MIN_ROWS = 1 << 19  # below this csr_matmul's single segment_sum is fine


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BandedFeatures:
    """Row-banded CSR feature matrix (device arrays; see module comment).

    ``vals`` holds the UNDROPPED values; layer-0 dropout applies elementwise
    to this [B, Emax] array per call (pad slots carry 0 and stay 0). The
    backward view reuses the SAME (possibly dropped) values through ``t_idx``,
    so the train-time mask is consistent between X·W and its dW transpose.
    """

    # Index arrays store COMPACT dtypes (the 16x-reddit feature matrix is
    # ~65M nnz; every stored byte/slot is ~300 MB of HBM argument):
    # cols is uint16 when F <= 65536, rows is int16 (band-local, rbw <= 32767
    # by policy), t_idx is uint16 when Emax <= 65536 else int32. The apply
    # upcasts per scan step ([Emax]-sized transients). The col-sorted feature
    # ids the dW reduction segments over are NOT stored: the backward
    # recomputes them per step as cols[t_idx] with pad slots (identified by
    # row sentinel rbw) rewritten to F — elementwise equal to the old stored
    # array at zero HBM.
    vals: jnp.ndarray    # (B, Emax) float; pad 0
    cols: jnp.ndarray    # (B, Emax) uint16|int32 into [0, F); pad 0
    rows: jnp.ndarray    # (B, Emax) int16|int32 band-local row; pad = rbw (dropped)
    t_idx: jnp.ndarray   # (B, Emax) uint16|int32 slot permutation: col-sorted order
    n_rows: int
    n_cols: int
    rbw: int

    def tree_flatten(self):
        return ((self.vals, self.cols, self.rows, self.t_idx),
                (self.n_rows, self.n_cols, self.rbw))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, n_rows=aux[0], n_cols=aux[1], rbw=aux[2])


def pack_banded_features(indptr, indices, rbw: int | None = None,
                         emax: int | None = None, n_feat: int | None = None,
                         n_bands: int | None = None):
    """Host-side pack of a CSR feature matrix into BandedFeatures index arrays
    (numpy in, numpy out; values are supplied separately so callers can pack
    once and swap dtypes). Returns a dict of arrays + static meta.

    ``rbw`` defaults to the module's FEAT_BAND_ROWS *at call time* so tests
    (and tuning) can override the policy knob without replumbing callers.
    ``emax``/``n_feat``/``n_bands`` override the inferred values so multiple
    packs can share uniform shapes and index dtypes (the sharded per-part
    stacking in make_banded_features_parts — SPMD needs one static program)."""
    import numpy as np

    rbw = FEAT_BAND_ROWS if rbw is None else rbw
    n_rows = indptr.shape[0] - 1
    if n_bands is None:
        n_bands = -(-n_rows // rbw)
    assert n_bands * rbw >= n_rows
    counts = np.diff(indptr.astype(np.int64))
    rows_flat = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    band_of = rows_flat // rbw
    band_nnz = np.bincount(band_of, minlength=n_bands)
    if emax is None:
        emax = int(band_nnz.max()) if n_bands else 0
    assert emax >= (int(band_nnz.max()) if n_bands else 0)
    starts = indptr[np.minimum(np.arange(n_bands) * rbw, n_rows)].astype(np.int64)
    # slot j of band b reads flat edge starts[b] + j (CSR order is band-major)
    slot = np.arange(emax, dtype=np.int64)[None, :]
    src = np.minimum(starts[:, None] + slot, max(indptr[-1] - 1, 0))
    valid = slot < band_nnz[:, None]
    if n_feat is None:
        n_feat = int(indices.max()) + 1 if len(indices) else 1
    col_dt = np.uint16 if n_feat <= (1 << 16) else np.int32
    row_dt = np.int16 if rbw <= np.iinfo(np.int16).max else np.int32
    idx_dt = np.uint16 if emax <= (1 << 16) else np.int32
    if len(indices):
        cols = np.where(valid, indices[src], 0).astype(col_dt)
        rows = np.where(valid, rows_flat[src] - np.arange(n_bands)[:, None] * rbw,
                        rbw).astype(row_dt)
    else:  # an all-empty slab (a pad-only part in the stacked layout)
        cols = np.zeros((n_bands, emax), col_dt)
        rows = np.full((n_bands, emax), rbw, row_dt)
    # within-band column-sorted permutation for the dW segment reduction; pad
    # slots sort to the end. The sorted feature-id array itself is NOT
    # materialized — the device backward recomputes it as cols[t_idx] with
    # pad slots (row sentinel rbw) rewritten to F (dropped by the [:F] slice).
    key_cols = np.where(valid, cols.astype(np.int64), np.iinfo(np.int64).max)
    t_idx = np.argsort(key_cols, axis=1, kind="stable").astype(idx_dt)
    return dict(cols=cols, rows=rows, t_idx=t_idx, valid=valid,
                n_bands=n_bands, emax=emax)


def make_banded_features(indptr, indices, values, n_cols: int, dtype,
                         rbw: int | None = None) -> BandedFeatures:
    """Pack + device-put: the prepare-time constructor used by train.prepare."""
    import numpy as np

    rbw = FEAT_BAND_ROWS if rbw is None else rbw
    p = pack_banded_features(indptr, indices, rbw)
    vals = np.zeros((p["n_bands"], p["emax"]), dtype=np.dtype(dtype))
    counts = np.diff(indptr.astype(np.int64))
    band_nnz = np.add.reduceat(counts, np.arange(0, indptr.shape[0] - 1, rbw)) \
        if indptr.shape[0] > 1 else np.zeros(0, np.int64)
    # fill band-major: slot j of band b is flat nnz starts[b]+j
    flat = np.asarray(values, dtype=np.dtype(dtype))
    pos = 0
    for b in range(p["n_bands"]):
        k = int(band_nnz[b])
        vals[b, :k] = flat[pos:pos + k]
        pos += k
    return BandedFeatures(
        vals=jnp.asarray(vals), cols=jnp.asarray(p["cols"]),
        rows=jnp.asarray(p["rows"]), t_idx=jnp.asarray(p["t_idx"]),
        n_rows=indptr.shape[0] - 1, n_cols=n_cols, rbw=rbw)


def _slice_feature_rows(indptr, indices, values, lo: int, hi: int, block: int):
    """One part's feature-CSR rows [lo, hi), re-based to row 0 and padded to
    ``block`` rows (pad rows carry 0 nnz) — the host-side slice the sharded
    feature constructors below build each device's slab from."""
    import numpy as np

    sub_ptr = indptr[lo:hi + 1].astype(np.int64) - np.int64(indptr[lo])
    if block > hi - lo:
        sub_ptr = np.concatenate(
            [sub_ptr, np.full(block - (hi - lo), sub_ptr[-1], np.int64)])
    sl = slice(int(indptr[lo]), int(indptr[hi]))
    return sub_ptr, indices[sl], values[sl]


def make_banded_features_parts(indptr, indices, values, bounds, block: int,
                               n_cols: int, dtype,
                               rbw: int | None = None) -> BandedFeatures:
    """Stacked per-part banded pack for the SPMD sharded path (numpy leaves).

    Every leaf is [P, n_bands, emax] with n_bands/emax/index-dtypes UNIFORM
    across parts (shard_map needs one static program; the mesh splits the
    leading axis, parallel/sharded.make_sharded_inputs). ``n_rows = block`` so
    each device's banded_matmul emits exactly its [block, d] activation slab —
    rows past a part's real span are all-pad bands contributing zeros, the
    same slab-padding contract as PartitionedGraph.pad_nodes. This is what
    lets the partitioned trainer keep huge feature matrices sparse
    (VERDICT round-3 weak #3: 16x-reddit dense features are 9.5 GB global;
    banded is ~1 GB split P ways)."""
    import numpy as np

    rbw = FEAT_BAND_ROWS if rbw is None else rbw
    bounds = np.asarray(bounds, dtype=np.int64)
    n_parts = len(bounds) - 1
    n_bands = -(-block // rbw)
    parts = [_slice_feature_rows(indptr, indices, values,
                                 int(bounds[p]), int(bounds[p + 1]), block)
             for p in range(n_parts)]
    # shared emax from per-band nnz, O(bands) per part via the padded indptr
    emax = 1
    for sub_ptr, _, _ in parts:
        edges = sub_ptr[np.minimum(np.arange(n_bands + 1) * rbw, block)]
        emax = max(emax, int(np.diff(edges).max()))
    packs = [pack_banded_features(sub_ptr, idx, rbw, emax=emax, n_feat=n_cols,
                                  n_bands=n_bands)
             for sub_ptr, idx, _ in parts]
    vals = np.zeros((n_parts, n_bands, emax), dtype=np.dtype(dtype))
    for p, (sub_ptr, _, val) in enumerate(parts):
        edges = sub_ptr[np.minimum(np.arange(n_bands + 1) * rbw, block)]
        flat = np.asarray(val, dtype=np.dtype(dtype))
        for b in range(n_bands):
            lo, hi = int(edges[b]), int(edges[b + 1])
            vals[p, b, : hi - lo] = flat[lo:hi]
    stack = lambda k: np.stack([pk[k] for pk in packs])
    return BandedFeatures(vals=vals, cols=stack("cols"), rows=stack("rows"),
                          t_idx=stack("t_idx"), n_rows=block, n_cols=n_cols,
                          rbw=rbw)


def make_sparse_features_parts(indptr, indices, values, bounds, block: int,
                               n_cols: int, dtype) -> SparseFeatures:
    """Stacked per-part padded-COO features (numpy leaves [P, nnz_max]) for
    the sharded layer-0 CSR path on graphs below the banded threshold.

    Rows are block-local and sorted ascending; pad slots carry value 0 with
    row = block-1 (appended after the sorted real slots, so csr_matmul's
    ``indices_are_sorted`` promise holds — pad contributions are exact zeros
    into the last owned row). ``n_rows = block``: each device's csr_matmul
    emits its [block, d] slab."""
    import numpy as np

    bounds = np.asarray(bounds, dtype=np.int64)
    n_parts = len(bounds) - 1
    spans = [(int(bounds[p]), int(bounds[p + 1])) for p in range(n_parts)]
    nnz_max = max(max(int(indptr[hi]) - int(indptr[lo]) for lo, hi in spans), 1)
    vals = np.zeros((n_parts, nnz_max), dtype=np.dtype(dtype))
    rows = np.full((n_parts, nnz_max), block - 1, dtype=np.int32)
    cols = np.zeros((n_parts, nnz_max), dtype=np.int32)
    for p, (lo, hi) in enumerate(spans):
        sub_ptr, idx, val = _slice_feature_rows(indptr, indices, values,
                                                lo, hi, block)
        k = len(idx)
        vals[p, :k] = val.astype(np.dtype(dtype))
        cols[p, :k] = idx.astype(np.int32)
        rows[p, :k] = np.repeat(np.arange(block, dtype=np.int32),
                                np.diff(sub_ptr))
    return SparseFeatures(values=vals, rows=rows, cols=cols,
                          n_rows=block, n_cols=n_cols)


@jax.custom_vjp
def banded_matmul(w: jnp.ndarray, vals: jnp.ndarray, bf: BandedFeatures) -> jnp.ndarray:
    """out[n_rows, d] = X · W with X in the banded layout and ``vals`` the
    (possibly dropout-scaled) [B, Emax] value array. Differentiable in ``w``
    only (the values are data; their only gradient path in the reference is
    the dropout mask, which needs no cotangent)."""
    return _banded_fwd_impl(w, vals, bf)


def _banded_fwd_impl(w, vals, bf):
    rbw = bf.rbw

    def step(_, x):
        v, c, r = x
        # indices store compact 16-bit lanes (BandedFeatures); upcast the
        # [Emax]-sized transient for the gather/segment ops
        gathered = w[c.astype(jnp.int32)] * v[:, None].astype(w.dtype)
        part = jax.ops.segment_sum(gathered.astype(jnp.float32),
                                   r.astype(jnp.int32),
                                   num_segments=rbw + 1, indices_are_sorted=True)
        return 0, part[:rbw]

    _, out = jax.lax.scan(step, 0, (vals, bf.cols, bf.rows))
    b = vals.shape[0]
    return out.reshape(b * rbw, w.shape[1])[: bf.n_rows].astype(w.dtype)


def _banded_vjp_fwd(w, vals, bf):
    return _banded_fwd_impl(w, vals, bf), (w, vals, bf)


def _banded_vjp_bwd(res, g):
    w, vals, bf = res
    b, rbw, f = vals.shape[0], bf.rbw, bf.n_cols
    gp = jnp.pad(g, ((0, b * rbw - g.shape[0]), (0, 0))).reshape(b, rbw, -1)

    def step(acc, x):
        v, t_idx, c, r, gb = x
        t_idx = t_idx.astype(jnp.int32)
        v_cs = jnp.take_along_axis(v, t_idx, axis=0)
        r_cs = jnp.take_along_axis(r.astype(jnp.int32), t_idx, axis=0)
        # col-sorted feature ids, recomputed instead of stored: pad slots
        # (row sentinel rbw) sit at the END of the sorted order, so rewriting
        # them to F keeps the ids ascending (the segment_sum's sorted promise)
        # and the [:f] slice drops their (zero-valued) contributions
        t_cols = jnp.where(r_cs == rbw, f,
                           jnp.take_along_axis(c.astype(jnp.int32), t_idx, axis=0))
        gath = gb[jnp.minimum(r_cs, rbw - 1)] * v_cs[:, None].astype(g.dtype)
        part = jax.ops.segment_sum(gath.astype(jnp.float32), t_cols,
                                   num_segments=f + 1, indices_are_sorted=True)
        return acc + part[:f], None

    # seed the carry from the cotangent (value 0): under shard_map the scan
    # body's output is device-varying, and a literal zeros carry (unvarying)
    # trips the carry-type check — deriving it from g gives it g's vma without
    # changing the math, in or out of shard_map
    acc0 = jnp.zeros((f, g.shape[1]), jnp.float32) + 0.0 * g[:1, :1].astype(jnp.float32).sum()
    dw, _ = jax.lax.scan(step, acc0,
                         (vals, bf.t_idx, bf.cols, bf.rows, gp))
    from cuda_gcn_tpu.ops.graphsum import _zero_cotangent

    return dw.astype(w.dtype), jnp.zeros_like(vals), _zero_cotangent(bf)


banded_matmul.defvjp(_banded_vjp_fwd, _banded_vjp_bwd)

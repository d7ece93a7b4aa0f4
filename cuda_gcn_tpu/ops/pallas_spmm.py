"""Pallas TPU kernel for the bucketed-ELL SpMM (graphsum aggregation).

This is the hand-written-kernel path of the graphsum op — the TPU-native
counterpart of the reference's CUDA GraphSum kernels
(src/cuda/cuda_kernel.cu:126-162: one block per node, one thread per feature,
gather formulation). On TPU there are no per-thread gathers; instead:

* The node-feature matrix ``h`` [N, d] is pinned whole in VMEM (the kernel is
  only selected when it fits — mid-size graphs like pubmed; note VMEM stores
  the LANE-PADDED array: an [N, d] f32 tile occupies [N, round_up(d, 128)]
  slots, which is what the budget check accounts for).
* The grid walks row-tiles of one degree bucket; each step loads a [TR, W] tile
  of neighbor ids and coefficients and accumulates
  ``sum_k coef[:, k] * h[cols[:, k]]`` with vectorized row gathers
  (``jnp.take`` lowers to Mosaic's dynamic-gather on TPU). Row gathers hit
  VMEM, not HBM — the whole point (HBM random row gathers cost ~12 ns each on
  the bench chip regardless of width; see scripts/chip_calibrate.py).
* The width loop is a ``fori_loop`` over fixed-size column chunks (bucket
  widths are powers of two from the ELL packing), so compile time stays flat
  even for the 2^16-wide hub bucket of a power-law graph.
* No scatter anywhere: bucket rows are disjoint, results are dense [TR, d]
  tiles.

Falls back to interpret mode off-TPU (tests run it on CPU), and the graphsum
dispatcher falls back to the XLA `ell` backend when ``h`` cannot fit VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Keep h + index tiles + accumulators comfortably inside VMEM (128 MB on v5e,
# 16 MB on older cores — stay conservative enough to win either way).
VMEM_BUDGET_BYTES = 64 * 1024 * 1024
# cols/coef tile budget: TR*W*8 bytes <= this (drives the adaptive row tile).
_IDX_TILE_BYTES = 2 * 1024 * 1024
_MAX_ROW_TILE = 256
_W_CHUNK = 64


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fits_vmem(n_nodes: int, dim: int, itemsize: int = 4) -> bool:
    """Whether [n_nodes, dim] fits the VMEM budget, lane padding included."""
    return n_nodes * _round_up(dim, 128) * itemsize <= VMEM_BUDGET_BYTES


def _row_tile(width: int) -> int:
    """Adaptive row-tile: keep the [TR, W] index tiles small for wide buckets."""
    tr = _MAX_ROW_TILE
    while tr > 8 and tr * width * 8 > _IDX_TILE_BYTES:
        tr //= 2
    return tr


def _ell_kernel(cols_ref, coef_ref, h_ref, out_ref):
    """One row-tile of one bucket: out[TR, d] = sum_k coef[:,k] * h[cols[:,k]].

    Width is walked in _W_CHUNK column chunks with a fori_loop (static trip
    count W // C); each step is one vectorized [TR*C]-row gather from VMEM.
    """
    tr, w = cols_ref.shape
    d = out_ref.shape[1]
    c = min(w, _W_CHUNK)
    h = h_ref[:]

    def body(i, acc):
        cols = cols_ref[:, pl.ds(i * c, c)]        # [TR, C] int32
        coef = coef_ref[:, pl.ds(i * c, c)]        # [TR, C]
        g = jnp.take(h, cols.reshape(-1), axis=0)  # [TR*C, d] VMEM row gather
        g = g.reshape(tr, c, d).astype(jnp.float32)
        return acc + jnp.sum(g * coef[..., None].astype(jnp.float32), axis=1)

    acc = jax.lax.fori_loop(0, w // c, body, jnp.zeros((tr, d), jnp.float32))
    out_ref[:] = acc.astype(out_ref.dtype)


def _pad_rows(arr, tile):
    r = arr.shape[0]
    pad = (-r) % tile
    if pad:
        arr = jnp.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1))
    return arr, r + pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bucket_spmm(cols, coef, h, *, interpret: bool):
    """[R, W] bucket -> [R, d] aggregated rows (padded rows produce garbage that
    the caller drops; padding cols are 0 with coef 0, so in-range and harmless)."""
    r, w = cols.shape
    tr = _row_tile(w)
    cols_p, rp = _pad_rows(cols, tr)
    coef_p, _ = _pad_rows(coef, tr)
    grid = (rp // tr,)
    out = pl.pallas_call(
        _ell_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole h resident
        ],
        out_specs=pl.BlockSpec((tr, h.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, h.shape[1]), h.dtype),
        interpret=interpret,
    )(cols_p, coef_p, h)
    return out[:r]


def ell_spmm(h: jnp.ndarray, buckets, n_nodes: int) -> jnp.ndarray:
    """Aggregate all ELL buckets with the Pallas kernel; returns [N, d]."""
    interpret = not _on_tpu()
    out = jnp.zeros((n_nodes, h.shape[1]), h.dtype)
    for b in buckets:
        out = out.at[b.rows].set(_bucket_spmm(b.cols, b.coef, h, interpret=interpret))
    return out

"""Pallas TPU kernel for the bucketed-ELL SpMM (graphsum aggregation).

This is the hand-written-kernel path of the graphsum op — the TPU-native
counterpart of the reference's CUDA GraphSum kernels
(src/cuda/cuda_kernel.cu:126-162: one block per node, one thread per feature,
gather formulation). On TPU there are no per-thread gathers; instead:

* The node-feature matrix ``h`` [N, d] is pinned whole in VMEM (the kernel is
  only selected when it fits — large graphs with small hidden dims, exactly the
  GCN regime: reddit's [233K, 16] fp32 is ~15 MB).
* The grid walks row-tiles of one degree bucket; each step loads a [TR, W] tile
  of neighbor ids and coefficients and accumulates
  ``sum_k coef[:, k] * h[cols[:, k]]`` with vectorized row gathers
  (``jnp.take`` lowers to Mosaic's dynamic-gather on TPU).
* No scatter anywhere: bucket rows are disjoint, results are dense [TR, d] tiles.

Falls back to interpret mode off-TPU (tests run it on CPU), and the graphsum
dispatcher falls back to the XLA `ell` backend when ``h`` cannot fit VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Keep kernel VMEM usage comfortably under the ~16MB/core budget.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024
_ROW_TILE = 256
_W_CHUNK = 8


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def fits_vmem(n_nodes: int, dim: int, itemsize: int = 4) -> bool:
    return n_nodes * dim * itemsize <= VMEM_BUDGET_BYTES


def _ell_kernel(cols_ref, coef_ref, h_ref, out_ref):
    """One row-tile of one bucket: out[TR, d] = sum_k coef[:,k] * h[cols[:,k]]."""
    cols = cols_ref[:]          # [TR, W] int32
    coef = coef_ref[:]          # [TR, W] f32
    h = h_ref[:]                # [N, d]
    w = cols.shape[1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    # unrolled over width chunks: W is a power of two from the ELL packing
    for k0 in range(0, w, _W_CHUNK):
        for k in range(k0, min(k0 + _W_CHUNK, w)):
            gathered = jnp.take(h, cols[:, k], axis=0)  # [TR, d] dynamic row gather
            acc = acc + gathered.astype(jnp.float32) * coef[:, k][:, None]
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
    r = cols.shape[0]
    cols_p, rp = _pad_rows(cols, _ROW_TILE)
    coef_p, _ = _pad_rows(coef, _ROW_TILE)
    grid = (rp // _ROW_TILE,)
    out = pl.pallas_call(
        _ell_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_TILE, cols.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, cols.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole h resident
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, h.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
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

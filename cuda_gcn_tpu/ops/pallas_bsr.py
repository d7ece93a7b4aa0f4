"""Pallas TPU pipeline for the BSR tile contraction (graphsum dense half).

This is the hand-scheduled counterpart of ``ops.graphsum._tile_contract``:
out[T, d, tb] = sum over tiles k of  h_block[cols[k]] x tiles[k]  scattered to
block-row rows[k]. It exists because the XLA formulation materializes two
HBM-round-trip intermediates per pass — the gathered activation blocks
``hT[:, cols]`` and the per-tile product ``prod[K, d, tb]`` that segment_sum
then re-reads — roughly tripling the traffic of the tiles themselves
(docs/PERF.md "Remaining per-epoch budget": ~60 ms/epoch of tile streaming +
intermediates at reddit-1x). The reference's analog is the CUDA SparseMatmul
kernel pair (src/cuda/cuda_kernel.cu:73-122), which also keeps its partial
products in registers rather than memory.

Design (megablox-style grouped matmul, scalar-prefetch edition):

* grid = (K,) over tiles, in block-row order (``bsr_rows`` is sorted by
  construction, data/graph._select_bsr_tiles).
* ``rows``/``cols`` ride in as scalar-prefetch operands, so the pipeline can
  compute every DMA address ahead of the compute: tiles stream ``(1, tb, tb)``
  blocks, activations stream the ``(1, dp, tb)`` block picked by ``cols[k]``,
  the output block is picked by ``rows[k]``.
* A ``(dp, tb)`` f32 VMEM scratch accumulates one block-row's partial sums
  across its (contiguous) run of tiles; it is zeroed at a run's first tile and
  flushed to the output block at its last. Pallas writes an output block back
  to HBM only when its index map changes, so each output row costs ONE HBM
  write regardless of how many tiles feed it.
* Block rows with no tiles are never visited by the grid; the kernel aliases a
  donated zeros array into the output so those blocks read back as zeros (the
  implicit semantics of the XLA segment_sum path).

Every tile is read from HBM exactly once and nothing K-sized is ever written:
traffic = tiles (bf16) + one [dp, tb] activation block per tile + one output
write per block row — the speed-of-light for this contraction short of
cross-tile activation reuse.

The kernel is only used for the sorted orientation (forward, and backward via
the symmetric-alias transpose that the headline graphs take,
ops.graphsum._transpose_forward); the explicit-transpose orientation has
unsorted block rows and stays on the XLA path. Activations are contracted in
their own dtype (tiles are upcast), accumulation is always f32 — same numerics
as the XLA einsum path's ``preferred_element_type=f32``.

Falls back to interpret mode off-TPU (tests pin exactness vs the XLA path on
CPU this way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bsr_kernel(rows_ref, cols_ref, tiles_ref, hb_ref, out0_ref, out_ref,
                acc_ref):
    del out0_ref  # donated zeros, aliased into out_ref (unvisited rows stay 0)
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    row = rows_ref[k]
    prev = rows_ref[jnp.maximum(k - 1, 0)]
    nxt = rows_ref[jnp.minimum(k + 1, nk - 1)]

    @pl.when((k == 0) | (row != prev))
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    hb = hb_ref[0]                            # [dp, tb] activation block
    tile = tiles_ref[0].astype(hb.dtype)      # [tb, tb] (upcast bf16 tiles)
    # out[d, i] = sum_j h[d, j] * tile[i, j]
    acc_ref[...] += jax.lax.dot_general(
        hb, tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when((k == nk - 1) | (row != nxt))
    def _flush():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


# VMEM budget for the resident-activations kernel variant: the whole
# [T, dp, tb] activation table lives in VMEM and each grid step dynamic-slices
# its column block in place of a per-step HBM block fetch (the per-step DMA
# chain is what holds the blocked variant ~2.5x off the tile-stream floor —
# artifacts/exp_pallas_bsr.json). v5e VMEM is 128 MB; leave room for the
# double-buffered tile blocks + accumulator.
_RESIDENT_H_BUDGET_BYTES = 96 * 1024 * 1024


def _bsr_kernel_resident(rows_ref, cols_ref, tiles_ref, hb_ref, out0_ref,
                         out_ref, acc_ref):
    del out0_ref
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    row = rows_ref[k]
    prev = rows_ref[jnp.maximum(k - 1, 0)]
    nxt = rows_ref[jnp.minimum(k + 1, nk - 1)]

    @pl.when((k == 0) | (row != prev))
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    hb = hb_ref[cols_ref[k]]                  # [dp, tb] dynamic VMEM slice
    tile = tiles_ref[0].astype(hb.dtype)
    acc_ref[...] += jax.lax.dot_general(
        hb, tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when((k == nk - 1) | (row != nxt))
    def _flush():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bsr_pallas_call_resident(rows, cols, tiles, hb, out0, *, interpret: bool):
    k, tb, _ = tiles.shape
    t_blocks, dp, _ = hb.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, tb, tb), lambda i, rows, cols: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table resident
            pl.BlockSpec((1, dp, tb), lambda i, rows, cols: (rows[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, dp, tb), lambda i, rows, cols: (rows[i], 0, 0)),
        scratch_shapes=[pltpu.VMEM((dp, tb), jnp.float32)],
    )
    return pl.pallas_call(
        _bsr_kernel_resident,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_blocks, dp, tb), jnp.float32),
        input_output_aliases={4: 0},
        interpret=interpret,
    )(rows, cols, tiles, hb, out0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bsr_pallas_call(rows, cols, tiles, hb, out0, *, interpret: bool):
    k, tb, _ = tiles.shape
    t_blocks, dp, _ = hb.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, tb, tb), lambda i, rows, cols: (i, 0, 0)),
            pl.BlockSpec((1, dp, tb), lambda i, rows, cols: (cols[i], 0, 0)),
            pl.BlockSpec((1, dp, tb), lambda i, rows, cols: (rows[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, dp, tb), lambda i, rows, cols: (rows[i], 0, 0)),
        scratch_shapes=[pltpu.VMEM((dp, tb), jnp.float32)],
    )
    return pl.pallas_call(
        _bsr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_blocks, dp, tb), jnp.float32),
        # operand order: rows, cols (scalar prefetch), tiles, hb, out0 — alias
        # the donated zeros into the output so unvisited block rows stay zero
        input_output_aliases={4: 0},
        interpret=interpret,
    )(rows, cols, tiles, hb, out0)


def bsr_tile_contract(tiles, rows, cols, h, n: int, t_blocks: int,
                      *, interpret: bool | None = None,
                      variant: str = "auto"):
    """Pallas tile contraction: returns the dense-part [n, d] in h.dtype.

    ``tiles`` [K, tb, tb] (any dtype; upcast to h.dtype in-kernel), ``rows``
    SORTED block-row ids, ``cols`` block-col ids, ``h`` [n, d] activations.
    Handles the full layout round trip (pad rows to t_blocks*tb, pad d to a
    sublane multiple, blocks-first transpose) so callers hand it the same
    operands as the XLA path.
    """
    if interpret is None:
        interpret = not _on_tpu()
    k, tb, _ = tiles.shape
    if k == 0:  # no tiles selected: dense part is identically zero
        return jnp.zeros((n, h.shape[1]), h.dtype)
    d = h.shape[1]
    dp = _round_up(max(d, 1), 16)
    hp = jnp.pad(h, ((0, t_blocks * tb - n), (0, dp - d)))
    hb = hp.reshape(t_blocks, tb, dp).transpose(0, 2, 1)  # [T, dp, tb]
    out0 = jnp.zeros((t_blocks, dp, tb), jnp.float32)
    if variant == "auto":
        resident = (t_blocks * dp * tb * hb.dtype.itemsize
                    <= _RESIDENT_H_BUDGET_BYTES)
    else:
        resident = variant == "resident"
    call = _bsr_pallas_call_resident if resident else _bsr_pallas_call
    outb = call(rows, cols, tiles, hb, out0, interpret=interpret)
    dense = outb.transpose(1, 0, 2).reshape(dp, t_blocks * tb)
    return dense[:d, :n].T.astype(h.dtype)

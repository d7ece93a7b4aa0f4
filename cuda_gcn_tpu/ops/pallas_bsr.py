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


# VMEM accounting for the resident-activations kernel variant: the whole
# [T, dp, tb] activation table lives in VMEM and each grid step dynamic-slices
# its column block in place of a per-step HBM block fetch. The whole-table
# BlockSpec is allocated on the kernel's SCOPED vmem stack, whose compiler
# default limit is 16 MiB — NOT the chip's 128 MiB of physical VMEM (round-4
# regression: an 85.75 MiB table passed a 96 MiB "total VMEM" gate and the
# compiler rejected it against the 16 MiB scoped limit, BENCH_r04.json). The
# resident call therefore (a) raises the kernel's limit via
# CompilerParams(vmem_limit_bytes=...) and (b) gates on the FULL working set
# (table + double-buffered tile/out blocks + accumulator) against a cap that
# leaves Mosaic internal-scratch headroom below physical VMEM.
_VMEM_BYTES = 128 * 1024 * 1024          # v5e physical VMEM per core
_RESIDENT_WORKING_SET_CAP = 100 * 1024 * 1024


def _resident_working_set_bytes(t_blocks: int, dp: int, tb: int,
                                h_itemsize: int, tile_itemsize: int) -> int:
    table = t_blocks * dp * tb * h_itemsize
    tile_blocks = 2 * tb * tb * tile_itemsize        # double-buffered stream
    out_blocks = 4 * dp * tb * 4                     # out + aliased out0, 2x
    acc = dp * tb * 4
    return table + tile_blocks + out_blocks + acc


def _resident_fits(t_blocks: int, dp: int, tb: int, h_itemsize: int,
                   tile_itemsize: int) -> bool:
    return (_resident_working_set_bytes(t_blocks, dp, tb, h_itemsize,
                                        tile_itemsize)
            <= _RESIDENT_WORKING_SET_CAP)


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
    # the whole-table BlockSpec lands on the kernel's scoped-vmem stack
    # (default limit 16 MiB); raise the limit to physical VMEM — the gate
    # (_resident_fits) and the AOT verification (verified_variant) bound the
    # actual working set below it
    return pl.pallas_call(
        _bsr_kernel_resident,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_blocks, dp, tb), jnp.float32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BYTES),
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


def select_variant(k: int, tb: int, t_blocks: int, dp: int,
                   h_itemsize: int, tile_itemsize: int) -> str:
    """Pure gate-math choice between the kernel variants (no compile check)."""
    del k
    if _resident_fits(t_blocks, dp, tb, h_itemsize, tile_itemsize):
        return "resident"
    return "blocked"


def preferred_variant(k: int, tb: int, t_blocks: int, dp: int,
                      h_itemsize: int, tile_itemsize: int) -> str:
    """Chip-probe-informed per-width policy (artifacts/exp_pallas_bsr.json,
    reddit dims, warm device-time per pass): the XLA einsum+segment_sum wins
    at one-vreg width (d=16: 8.1 ms vs 9.0-9.4) where its gather
    intermediates are cheap; the Pallas pipeline is width-independent
    (~9-12 ms = tile-stream bound) and wins above (d=82: 10.9 vs 17.4).
    Between the variants, blocked wins at mid widths (32/48) and resident
    wins once the per-step streamed [dp, tb] activation block is large
    (dp>=64: 10.9 vs 12.0 at dp=96) and the table fits VMEM."""
    if dp <= 16:
        return "xla"
    if dp >= 64 and _resident_fits(t_blocks, dp, tb, h_itemsize,
                                   tile_itemsize):
        return "resident"
    return "blocked"


# Memoized AOT-verified engine per shape key. Populated by verified_variant —
# at prepare time (train.prepare warms the widths a run will trace) or lazily
# at trace time. "xla" means neither Pallas variant compiled; the caller
# (ops.graphsum._dense_tile_part) then takes the XLA einsum path, so an engine
# regression degrades the number instead of killing the run (VERDICT r4 #1b).
_ENGINE_CACHE: dict = {}


def _aot_compiles(variant: str, k: int, tb: int, t_blocks: int, dp: int,
                  h_dtype, tile_dtype) -> bool:
    """AOT-compile one kernel variant at the given dims for the default
    backend (compile only — nothing executes; on the tunneled TPU this goes
    through the remote compile service without claiming the chip)."""
    call = _bsr_pallas_call_resident if variant == "resident" else _bsr_pallas_call
    sds = jax.ShapeDtypeStruct
    args = (sds((k,), jnp.int32), sds((k,), jnp.int32),
            sds((k, tb, tb), tile_dtype), sds((t_blocks, dp, tb), h_dtype),
            sds((t_blocks, dp, tb), jnp.float32))
    try:
        jax.jit(functools.partial(call, interpret=False)).lower(*args).compile()
        return True
    except Exception:  # Mosaic/XLA compile failure: reject this variant
        return False


def verified_variant(k: int, tb: int, t_blocks: int, dp: int,
                     h_dtype, tile_dtype) -> str:
    """Probe-informed policy choice hardened by an actual TPU compile:
    returns 'resident' | 'blocked' | 'xla'. Off-TPU the policy choice is
    returned directly (interpret mode always lowers). Round-4 lesson
    (BENCH_r04.json): a budget gate alone shipped a kernel the compiler
    rejects at flagship dims; the compiler is the only authority on what
    fits."""
    h_dtype = jnp.dtype(h_dtype)
    tile_dtype = jnp.dtype(tile_dtype)
    key = (int(k), int(tb), int(t_blocks), int(dp), str(h_dtype),
           str(tile_dtype))
    hit = _ENGINE_CACHE.get(key)
    if hit is not None:
        return hit
    first = preferred_variant(k, tb, t_blocks, dp, h_dtype.itemsize,
                              tile_dtype.itemsize)
    if first == "xla" or not _on_tpu():
        _ENGINE_CACHE[key] = first
        return first
    choice = "xla"
    for variant in dict.fromkeys((first, "blocked")):
        if _aot_compiles(variant, k, tb, t_blocks, dp, h_dtype, tile_dtype):
            choice = variant
            break
    _ENGINE_CACHE[key] = choice
    return choice


def padded_width(d: int) -> int:
    """The sublane-padded feature width the layout round trip uses."""
    return _round_up(max(int(d), 1), 16)


def warm_engine_cache(k: int, tb: int, t_blocks: int, widths, h_dtype,
                      tile_dtype) -> dict:
    """Resolve the verified engine for every feature width a run will trace,
    so no AOT probe fires mid-trace. Returns {width: engine}."""
    return {int(d): verified_variant(k, tb, t_blocks, padded_width(d),
                                     h_dtype, tile_dtype)
            for d in widths}


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
    dp = padded_width(d)
    hp = jnp.pad(h, ((0, t_blocks * tb - n), (0, dp - d)))
    hb = hp.reshape(t_blocks, tb, dp).transpose(0, 2, 1)  # [T, dp, tb]
    out0 = jnp.zeros((t_blocks, dp, tb), jnp.float32)
    if variant == "auto":
        variant = select_variant(int(k), int(tb), t_blocks, dp,
                                 hb.dtype.itemsize, tiles.dtype.itemsize)
    call = _bsr_pallas_call_resident if variant == "resident" else _bsr_pallas_call
    outb = call(rows, cols, tiles, hb, out0, interpret=interpret)
    dense = outb.transpose(1, 0, 2).reshape(dp, t_blocks * tb)
    return dense[:d, :n].T.astype(h.dtype)

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

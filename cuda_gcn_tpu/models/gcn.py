"""The Kipf & Welling GCN as a pure function.

Replaces the reference's fixed 8-module pipeline with in-place mutation and a
hand-reversed backward list (src/seq/gcn.cpp:21-59: Dropout → SparseMatmul →
GraphSum → ReLU → Dropout → Matmul → GraphSum → CrossEntropyLoss) by a pure
``apply(params, graph, x, ...)`` whose backward comes from ``jax.grad`` through the
graphsum custom VJP. Layer ℓ computes H' = Â · (dropout(H) · Wℓ), ReLU on all but
the last layer; generic in depth (the reference is hard-wired to 2 layers).

Glorot init matches Variable::glorot (src/seq/variable.cpp:11-18): uniform in
(-a, a) with a = sqrt(6/(fan_in+fan_out)). The reference seeds from time(NULL)
(src/seq/rand.cpp:7) — non-reproducible; we take an explicit PRNG key.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from cuda_gcn_tpu.data.graph import Graph
from cuda_gcn_tpu.ops.dropout import dropout
from cuda_gcn_tpu.ops.graphsum import graphsum, graphsum_pair
from cuda_gcn_tpu.ops.loss import l2_penalty, masked_cross_entropy, strict_accuracy
from cuda_gcn_tpu.ops.matmul import (BandedFeatures, SparseFeatures,
                                     banded_matmul, csr_matmul, dense_matmul)

Params = dict[str, jnp.ndarray]


def _layer0_transform(x, w, rate, key, training):
    """dropout(x) @ W for the first layer, honoring a sparse input.

    Dense x: elementwise dropout + MXU matmul. SparseFeatures x: dropout on the
    nnz VALUES (the reference's layer-0 dropout, gcn.cpp:23 — equivalent in
    distribution to dense dropout since dropped zeros stay zero) followed by the
    CSR SpMM (reference SparseMatmul, module.cpp:47-77).
    """
    if isinstance(x, BandedFeatures):
        # huge-graph sparse path: dropout on the packed [B, Emax] values (pad
        # slots are 0 and stay 0), banded SpMM bounds every segment output
        vals = dropout(x.vals, rate, key, training)
        return banded_matmul(w, vals, x)
    if isinstance(x, SparseFeatures):
        vals = dropout(x.values, rate, key, training)
        return csr_matmul(vals, x.rows, x.cols, w, x.n_rows)
    return dense_matmul(dropout(x, rate, key, training), w)


def glorot(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32) -> jnp.ndarray:
    a = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, (fan_in, fan_out), dtype=jnp.float32, minval=-a, maxval=a).astype(dtype)


def init_params(key: jax.Array, layer_dims: tuple[int, ...], dtype=jnp.float32) -> Params:
    """Weights {'w1': [F,H], 'w2': [H,C], ...} for consecutive layer_dims pairs."""
    keys = jax.random.split(key, len(layer_dims) - 1)
    return {
        f"w{i + 1}": glorot(k, layer_dims[i], layer_dims[i + 1], dtype)
        for i, k in enumerate(keys)
    }


def apply(params: Params, graph: Graph, x: jnp.ndarray, *,
          key: jax.Array | None = None, dropout_rate: float = 0.0,
          training: bool = False) -> jnp.ndarray:
    """Forward pass -> logits [N, C]."""
    n_layers = len(params)
    keys = jax.random.split(key, n_layers) if (training and key is not None) else [None] * n_layers
    h = x
    for i in range(n_layers):
        if i == 0:
            h = _layer0_transform(h, params["w1"], dropout_rate, keys[0], training)
        else:
            h = dropout(h, dropout_rate, keys[i], training)
            h = dense_matmul(h, params[f"w{i + 1}"])
        h = graphsum(h, graph)
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)  # ReLU (module.cpp:177-183)
    return h


def apply_pair(params: Params, graph: Graph, x: jnp.ndarray, *,
               key: jax.Array, dropout_rate: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One fused forward computing BOTH the dropout-active training logits and
    the eval (no-dropout) logits for the same params.

    graphsum is linear, so both passes ride ONE aggregation per layer at
    concatenated width — on TPU the per-edge gathers are latency-bound and
    width-independent (docs/PERF.md), so this halves the number of adjacency
    passes versus running train and eval forwards separately. Gradients flow
    only through the training half: graphsum_pair differentiates at TRAIN
    width (the eval half is stop_gradient'ed — it only feeds val metrics), so
    the backward adjacency passes and their f32 streaming accumulators never
    pay the concatenated width (ops/graphsum.graphsum_pair).
    """
    n_layers = len(params)
    keys = jax.random.split(key, n_layers)
    ht = he = x
    for i in range(n_layers):
        w = params[f"w{i + 1}"]
        if i == 0:
            zt = _layer0_transform(ht, w, dropout_rate, keys[0], True)
            ze = _layer0_transform(he, w, 0.0, None, False)
        else:
            zt = dense_matmul(dropout(ht, dropout_rate, keys[i], True), w)
            ze = dense_matmul(he, w)
        ht, he = graphsum_pair(zt, ze, graph)
        if i < n_layers - 1:
            ht = jnp.maximum(ht, 0.0)
            he = jnp.maximum(he, 0.0)
    return ht, he


def loss_fn(params: Params, graph: Graph, x: jnp.ndarray, truth: jnp.ndarray, *,
            weight_decay: float, key: jax.Array | None = None,
            dropout_rate: float = 0.0, training: bool = False):
    """Reported loss = masked CE + wd/2·||W1||² (gcn.cpp:112, :98-105).

    jax.grad of this reproduces the reference's effective gradient: the CE part
    equals (softmax-onehot)/count on masked rows (module.cpp:145-158) and the L2
    part contributes wd·W1 to W1's gradient only (optim.cpp:30-31 decay flag is
    true only for layer-1 weights, gcn.cpp:65).
    """
    logits = apply(params, graph, x, key=key, dropout_rate=dropout_rate, training=training)
    loss = masked_cross_entropy(logits, truth) + l2_penalty(params["w1"], weight_decay)
    acc = strict_accuracy(logits, truth)
    return loss, (logits, acc)

"""Numpy oracle implementing the reference's exact forward/backward math.

This is a from-spec reimplementation of the sequential engine's semantics
(src/seq/module.cpp, gcn.cpp, optim.cpp) used as the golden source for parity
tests — the reference itself has no tests (SURVEY.md §4), so, like the reference
authors did against Kipf's TensorFlow implementation, we verify by
cross-implementation comparison.
"""

from __future__ import annotations

import numpy as np


def graphsum_forward(indptr: np.ndarray, indices: np.ndarray, h: np.ndarray) -> np.ndarray:
    """GraphSum::forward (module.cpp:83-101): out[src] += coef*in[dst] per CSR edge,
    coef = 1/sqrt(rowlen(src)*rowlen(dst)) recomputed on the fly."""
    n = len(indptr) - 1
    out = np.zeros_like(h)
    rowlen = np.diff(indptr)
    for src in range(n):
        for e in range(indptr[src], indptr[src + 1]):
            dst = indices[e]
            coef = 1.0 / np.sqrt(float(rowlen[src]) * float(rowlen[dst]))
            out[src] += coef * h[dst]
    return out


def graphsum_backward(indptr: np.ndarray, indices: np.ndarray, g: np.ndarray) -> np.ndarray:
    """GraphSum::backward (module.cpp:103-119): same stencil applied to grads."""
    return graphsum_forward(indptr, indices, g)


def sparse_matmul_forward(f_indptr, f_indices, values, w):
    """SparseMatmul::forward (module.cpp:47-61)."""
    n = len(f_indptr) - 1
    out = np.zeros((n, w.shape[1]), dtype=np.float64)
    for i in range(n):
        for jj in range(f_indptr[i], f_indptr[i + 1]):
            out[i] += values[jj] * w[f_indices[jj]]
    return out


def cross_entropy(logits: np.ndarray, truth: np.ndarray):
    """CrossEntropyLoss::forward (module.cpp:126-161): returns (loss, grad)."""
    n, c = logits.shape
    total, count = 0.0, 0
    grad = np.zeros_like(logits)
    for i in range(n):
        if truth[i] < 0:
            continue
        count += 1
        row = logits[i] - logits[i].max()
        sum_exp = np.exp(row).sum()
        total += np.log(sum_exp) - row[truth[i]]
        grad[i] = np.exp(row) / sum_exp
        grad[i, truth[i]] -= 1.0
    return total / count, grad / count


def strict_accuracy(logits: np.ndarray, truth: np.ndarray) -> float:
    """GCN::get_accuracy (gcn.cpp:83-96): wrong if ANY logit > truth logit."""
    wrong, total = 0, 0
    for i in range(len(truth)):
        if truth[i] < 0:
            continue
        total += 1
        if (logits[i] > logits[i, truth[i]]).any():
            wrong += 1
    return (total - wrong) / total


def adam_step(w, g, m, v, t, lr=1e-3, beta1=0.9, beta2=0.999, eps=1e-8,
              weight_decay=0.0, decay=False):
    """Adam::step (optim.cpp:24-37) for one tensor; t is the post-increment count."""
    step_size = lr * np.sqrt(1 - beta2**t) / (1 - beta1**t)
    if decay:
        g = g + weight_decay * w
    m = beta1 * m + (1 - beta1) * g
    v = beta2 * v + (1 - beta2) * g * g
    w = w - step_size * m / (np.sqrt(v) + eps)
    return w, m, v


def gcn_forward(indptr, indices, x_dense, w1, w2):
    """Eval-mode 2-layer forward (gcn.cpp:21-59 module order, dropout inactive):
    logits = Â·relu(Â·(X·W1))·W2 ... precisely GraphSum(ReLU(GraphSum(X·W1))·W2)."""
    h = x_dense @ w1
    h = graphsum_forward(indptr, indices, h)
    h = np.maximum(h, 0.0)
    h = h @ w2
    return graphsum_forward(indptr, indices, h)

"""Masked softmax cross-entropy, strict-argmax accuracy, and L2 penalty.

Matches reference semantics exactly:

* CE (src/seq/module.cpp:126-161): mean over nodes whose ``truth >= 0`` of
  ``logsumexp(logits) - logits[truth]`` with max-subtraction stabilization.
  (The reference mutates logits in place and seeds the gradient
  ``(softmax - onehot)/count`` inside forward; we are functional and let
  ``jax.grad`` produce the identical gradient.)
* Accuracy (src/seq/gcn.cpp:83-96): *strict* argmax — a node counts as correct
  only if NO logit strictly exceeds the truth logit (ties count as correct).
* L2 penalty (src/seq/gcn.cpp:98-105): ``weight_decay/2 * ||W1||²`` over the
  layer-1 weight only, added to the *reported* loss. Because the reference's Adam
  separately adds ``weight_decay * W1`` to the gradient (src/seq/optim.cpp:30-31),
  taking ``jax.grad`` of (CE + l2_penalty) reproduces the reference's effective
  gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_cross_entropy(logits: jnp.ndarray, truth: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over nodes with truth >= 0. logits [N, C] float, truth [N] int (-1 masked)."""
    mask = truth >= 0
    count = jnp.sum(mask)
    safe_truth = jnp.where(mask, truth, 0)
    logits32 = logits.astype(jnp.float32)
    shifted = logits32 - jax.lax.stop_gradient(jnp.max(logits32, axis=1, keepdims=True))
    log_z = jnp.log(jnp.sum(jnp.exp(shifted), axis=1))
    per_node = log_z - jnp.take_along_axis(shifted, safe_truth[:, None], axis=1)[:, 0]
    return jnp.sum(jnp.where(mask, per_node, 0.0)) / count


def strict_accuracy(logits: jnp.ndarray, truth: jnp.ndarray) -> jnp.ndarray:
    """Fraction of masked nodes where no logit strictly exceeds the truth logit."""
    mask = truth >= 0
    safe_truth = jnp.where(mask, truth, 0)
    truth_logit = jnp.take_along_axis(logits, safe_truth[:, None], axis=1)[:, 0]
    correct = jnp.max(logits, axis=1) <= truth_logit
    return jnp.sum(jnp.where(mask, correct, False).astype(jnp.float32)) / jnp.sum(mask)


def l2_penalty(w1: jnp.ndarray, weight_decay: float) -> jnp.ndarray:
    """weight_decay/2 * ||W1||² — reported-loss term AND (via grad) the decay term."""
    return 0.5 * weight_decay * jnp.sum(jnp.square(w1.astype(jnp.float32)))

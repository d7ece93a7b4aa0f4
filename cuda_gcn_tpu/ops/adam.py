"""Adam optimizer with the reference's exact update rule, as a pure pytree transform.

Reference (src/seq/optim.cpp:24-37 and the fused CUDA kernel
src/cuda/cuda_kernel.cu:270-281):

    step_size = lr * sqrt(1 - beta2^t) / (1 - beta1^t)
    g         = grad (+ weight_decay * w  for decay-flagged tensors)
    m         = beta1*m + (1-beta1)*g
    v         = beta2*v + (1-beta2)*g²
    w        -= step_size * m / (sqrt(v) + eps)

Notes:
* This is the *bias-corrected step size* formulation (not separate m̂/v̂), and the
  decay term enters m and v too (L2, not AdamW). Our gradients already include the
  decay term because the loss includes the L2 penalty (see ops/loss.py), so
  ``decay`` handling lives in the loss, matching the reference's effective math.
* Defaults {lr 1e-3, β1 .9, β2 .999, eps 1e-8, wd 0} (optim.cpp:6-8); the trainer
  overrides lr from the config (gcn.cpp:62-64).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AdamParams:
    lr: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AdamState:
    m: Any          # pytree like params
    v: Any          # pytree like params
    step: jnp.ndarray  # scalar int32

    def tree_flatten(self):
        return (self.m, self.v, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def init(params: Any) -> AdamState:
    zeros = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamState(m=zeros, v=jax.tree_util.tree_map(jnp.copy, zeros), step=jnp.zeros((), jnp.int32))


def apply(params: Any, grads: Any, state: AdamState, hp: AdamParams):
    """One Adam step; returns (new_params, new_state)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    step_size = hp.lr * jnp.sqrt(1.0 - hp.beta2**t) / (1.0 - hp.beta1**t)

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m_new = hp.beta1 * m + (1.0 - hp.beta1) * g
        v_new = hp.beta2 * v + (1.0 - hp.beta2) * g * g
        p_new = p.astype(jnp.float32) - step_size * m_new / (jnp.sqrt(v_new) + hp.eps)
        return p_new.astype(p.dtype), m_new, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(m=new_m, v=new_v, step=step)

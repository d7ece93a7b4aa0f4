"""Inverted dropout with explicit threefry keys.

Reference semantics (src/seq/module.cpp:207-221; CUDA: cuda_kernel.cu:224-248):
keep an element with probability 1-p and scale kept values by 1/(1-p); identity
when not training. The reference draws xorshift128+ variates (CPU) or curand with
a fixed pool of 1024 states and seed 1234 (GPU) — streams that cannot be
reproduced cross-backend even in the reference itself, so parity is defined
distributionally, not bitwise. We use JAX's counter-based threefry with explicit
keys: reproducible, splittable, and pure (no RNG state object to carry).

The reference applies layer-0 dropout to the *nonzero values* of the sparse
feature matrix (gcn.cpp:21-23); dropping zeros is a no-op, so masking the dense
feature matrix elementwise is the same distribution over outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(x: jnp.ndarray, rate: float, key: jax.Array | None, training: bool) -> jnp.ndarray:
    if not training or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, shape=x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)

"""Dropout PRNG cost: threefry (JAX default) vs rbg (hardware RngBitGenerator).

Dropout is the #2 op at reddit scale after graphsum (7.4 ms fw + 4.6 ms bw of
~291 ms/epoch, artifacts/op_timing_reddit.json) and most of the forward cost
is threefry bit generation for the [233K, 602] mask — pure VPU ALU work. XLA
lowers jax's 'rbg' PRNG to the TPU's hardware RngBitGenerator instead, which
should cut the mask cost to near the bandwidth floor.

The reference draws xorshift128+/curand variates (src/seq/rand.cpp,
src/cuda/cuda_kernel.cu:224-248) — streams that differ between its OWN two
engines, so dropout parity is distributional, not bitwise (ops/dropout.py),
and swapping threefry for rbg is semantics-preserving in the same sense.

Measures, at reddit bench shapes on the current backend: bernoulli-mask
generation alone, and dropout fwd+bwd, under both impls. Run on the chip:
    python scripts/exp_prng.py            # TPU
    python scripts/exp_prng.py --platform cpu --n 10000   # smoke
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def time_scalar(fn, *args, iters=20):
    """Median wall time via scalar materialization (tunneled-TPU-safe)."""
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--n", type=int, default=232965)
    ap.add_argument("--f", type=int, default=602)
    ap.add_argument("--rate", type=float, default=0.5)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    x = jnp.ones((args.n, args.f), jnp.float32)
    g = jnp.ones((args.n, args.f), jnp.float32)
    rate = args.rate

    results = {}
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)

        @jax.jit
        def mask_sum(k, x=x):
            return jax.random.bernoulli(k, 1.0 - rate, shape=x.shape).sum()

        @jax.jit
        def drop_fwd_bwd(k, x=x, g=g):
            def f(x):
                keep = jax.random.bernoulli(k, 1.0 - rate, shape=x.shape)
                return (jnp.where(keep, x / (1.0 - rate), 0.0) * g).sum()

            val, grad = jax.value_and_grad(f)(x)
            return val + grad.sum()

        float(mask_sum(key)); float(drop_fwd_bwd(key))  # compile
        results[impl] = dict(
            mask_ms=time_scalar(mask_sum, key) * 1e3,
            fwd_bwd_ms=time_scalar(drop_fwd_bwd, key) * 1e3,
        )
        print(f"{impl:12s}: mask {results[impl]['mask_ms']:.2f} ms, "
              f"dropout fwd+bwd {results[impl]['fwd_bwd_ms']:.2f} ms",
              flush=True)
    tf, rb = results["threefry2x32"], results["rbg"]
    print(f"rbg speedup: mask {tf['mask_ms'] / rb['mask_ms']:.2f}x, "
          f"fwd+bwd {tf['fwd_bwd_ms'] / rb['fwd_bwd_ms']:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())

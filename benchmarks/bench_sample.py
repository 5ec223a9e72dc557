#!/usr/bin/env python3
"""sample_token cost vs batch size: is per-step sampling a slot-scaling
term in batched serving?

bench_step's decode surgery uses argmax (no PRNG), but the real chunk
samples `jax.random.categorical` per step: B x V gumbel uniforms from
threefry, which is VPU-expensive on TPU.  This measures sample_token at
serving shapes, chained inside a scan so dispatch overhead cancels.

The PRNG impl is selected per process: run once with the default
(threefry) and once with JAX_DEFAULT_PRNG_IMPL=rbg (hardware RNG — a
different, still-deterministic sample stream; worth a default flip for
serving only if threefry turns out to be a real slot-scaling term).

Usage: [JAX_DEFAULT_PRNG_IMPL=rbg] python benchmarks/bench_sample.py [V]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from miotts_tpu.models.llm import sample_token


def time_batch(B: int, V: int, n: int = 256) -> float:
    """us per sample_token step at batch B (marginal between two chain
    lengths, so compile/dispatch constants cancel)."""
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    logits0 = jnp.asarray(np.random.default_rng(0)
                          .standard_normal((B, V)), jnp.float32)
    temp = jnp.full((B,), 0.8, jnp.float32)

    def run_n(steps):
        @jax.jit
        def run(keys, logits):
            def body(carry, _):
                keys, logits = carry
                splits = jax.vmap(jax.random.split)(keys)
                sub, keys = splits[:, 1], splits[:, 0]
                tok = sample_token(logits, temp, sub)
                # couple tok back into logits so nothing hoists out
                logits = logits + (tok[:, None] % 7).astype(jnp.float32) * 1e-9
                return (keys, logits), ()
            (keys, logits), _ = jax.lax.scan(body, (keys, logits),
                                             None, length=steps)
            return jnp.sum(logits) * 1e-9
        jax.device_get(run(keys, logits0))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(run(keys, logits0))
            best = min(best, time.perf_counter() - t0)
        return best
    n1, n2 = max(8, n // 4), n
    t1, t2 = run_n(n1), run_n(n2)
    return (t2 - t1) / (n2 - n1) * 1e6


def main() -> int:
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 13059
    impl = os.environ.get("JAX_DEFAULT_PRNG_IMPL", "threefry(default)")
    for B in (1, 64, 96, 128):
        us = time_batch(B, V)
        print(f"  {impl:18s} B={B:4d}: {us:8.1f} us/step "
              f"({us / B:6.2f} us/slot)", file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Serving-chunk slot scaling: time the REAL batched serving executable
(`llm_generate_chunk_batched` — chunk-buffered KV protocol, per-slot PRNG
sampling included) at several slot counts in one process.

bench_step's surgery harness times plain `llm_forward` steps, which use
the per-step scatter write the chunk protocol was built to avoid and skip
sampling entirely — so it cannot attribute the serving per-stream
collapse (1.53x/1.06x/0.74x at 64/96/128 slots).  This bench measures the
exact executable the ContinuousBatcher dispatches.

Per B: marginal ms/step from two chunk lengths (n_steps 8 vs 24), so the
per-dispatch constant and the once-per-chunk KV merge cost are separated:
  T(n) = a + b*n  ->  b = per-step cost, a = dispatch + merge.

Usage: python benchmarks/bench_chunk.py [ctx] [attn_len]
Env: MIOTTS_BENCH_MODEL (default 2.6b-q4_k), MIOTTS_BENCH_QKV=1 for int8
KV, MIOTTS_BENCH_BATCHES (default "64,96,128").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("MIOTTS_BENCH_MODEL", "2.6b-q4_k")

import jax
import jax.numpy as jnp
import numpy as np

import bench as benchmod
from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models.llm import (LLMConfig, init_kv_cache,
                                   llm_generate_chunk_batched, llm_prefill)


def main() -> int:
    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    attn_len = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    batches = [int(b) for b in
               os.environ.get("MIOTTS_BENCH_BATCHES", "64,96,128").split(",")]
    qkv = bool(os.environ.get("MIOTTS_BENCH_QKV"))

    llm_path, _, _ = benchmod.ensure_models()
    reader = GGUFReader(llm_path)
    cfg = LLMConfig.from_gguf(reader)
    from miotts_tpu.models.llm import load_llm_params
    params, _ = load_llm_params(reader, cfg, dtype=jnp.bfloat16)
    print(f"model: {benchmod.MODEL} ctx={ctx} attn_len={attn_len} "
          f"qkv={qkv}", file=sys.stderr, flush=True)

    stop_ids = jnp.asarray([-1, -1], jnp.int32)  # never stop

    for B in batches:
        temp = jnp.full((B,), 0.8, jnp.float32)

        def timed(n_steps, reps=5):
            # own state per measurement: the chunk donates its cache, so
            # buffers must be rethreaded and never reused across timed()s
            import gc
            gc.collect()   # 2 live caches at B=128/ctx512 OOM a v5e (r4)
            cache = init_kv_cache(cfg, B, ctx, dtype=jnp.bfloat16,
                                  quantized=qkv)
            toks = jnp.zeros((B, 64), jnp.int32)
            last, cache = llm_prefill(params, toks,
                                      jnp.full((B,), 8, jnp.int32),
                                      cache, cfg)
            keys = jax.random.split(jax.random.PRNGKey(0), B)
            # warm (compile) once per (B, n_steps)
            buf, _, last, cache, keys = llm_generate_chunk_batched(
                params, last, cache, jnp.ones((B,), bool), keys, temp,
                stop_ids, cfg, n_steps, attn_len)
            jax.device_get(buf)
            best = float("inf")
            for _ in range(reps):
                # reset fill so attention traffic stays comparable
                cache = dict(cache, fill=jnp.full((B,), 8, jnp.int32))
                t0 = time.perf_counter()
                buf, _, last, cache, keys = llm_generate_chunk_batched(
                    params, last, cache, jnp.ones((B,), bool), keys, temp,
                    stop_ids, cfg, n_steps, attn_len)
                jax.device_get(buf)
                best = min(best, time.perf_counter() - t0)
            return best

        n1, n2 = 8, 24
        t1, t2 = timed(n1), timed(n2)
        per_step = (t2 - t1) / (n2 - n1)
        const = t1 - per_step * n1
        print(f"  B={B:4d}: {per_step * 1e3:7.2f} ms/step "
              f"({per_step * 1e3 / B:6.3f} ms/slot-token), "
              f"dispatch+merge {const * 1e3:6.1f} ms/chunk",
              file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

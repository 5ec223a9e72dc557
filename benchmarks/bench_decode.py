"""Decode-loop microbenchmark: marginal cost per token vs per-program cost.

Times `llm_generate_chunk` (the fused on-device decode loop) at several
chunk sizes on the real TPU; a linear fit splits the per-token marginal
cost (kernel work inside the while_loop body) from the fixed per-program
cost (dispatch + relay + program prologue).  This is the number that
bounds single-stream streaming throughput — the weights-bandwidth
speed-of-light for the bench models is printed alongside for reference.

Usage: python benchmarks/bench_decode.py [chunk sizes ...]
Env: MIOTTS_BENCH_MODEL (same as bench.py), MIOTTS_BENCH_QKV=1 for int8 KV.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as benchmod
from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models.llm import (LLMConfig, init_kv_cache, llm_generate_chunk,
                                   llm_prefill, load_llm_params)


def main() -> int:
    chunks = [int(a) for a in sys.argv[1:]] or [16, 64, 256]
    llm_path, _, _ = benchmod.ensure_models()
    reader = GGUFReader(llm_path)
    cfg = LLMConfig.from_gguf(reader)
    params, _ = load_llm_params(reader, cfg, dtype=jnp.bfloat16)
    print(f"model: {benchmod.MODEL} ({cfg.n_layers}L/{cfg.dim}d)",
          file=sys.stderr)

    # weight bytes actually read per token (quantized planar buffers)
    def nbytes(t):
        return sum(getattr(leaf, "nbytes", 0) for leaf in jax.tree.leaves(t))

    wbytes = nbytes(params)
    cache = init_kv_cache(cfg, 1, 1024,
                          dtype=jnp.bfloat16,
                          quantized=bool(os.environ.get("MIOTTS_BENCH_QKV")))
    toks = jnp.zeros((1, 64), jnp.int32)
    last, cache = llm_prefill(params, toks, jnp.asarray([8], jnp.int32),
                              cache, cfg)
    stop_ids = jnp.asarray([-1, -1], jnp.int32)

    results = {}
    for n in chunks:
        # warmup/compile
        buf, cnt, done, last, cache, _ = llm_generate_chunk(
            params, last, cache, jax.random.PRNGKey(0), jnp.float32(1.0),
            stop_ids, cfg, n)
        jax.device_get(buf)   # relay: block_until_ready alone returns early
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            buf, cnt, done, last, cache, _ = llm_generate_chunk(
                params, last, cache, jax.random.PRNGKey(1), jnp.float32(1.0),
                stop_ids, cfg, n)
            jax.device_get(buf)
            best = min(best, time.perf_counter() - t0)
        results[n] = best
        print(f"chunk {n:4d}: {best*1e3:8.2f} ms  "
              f"({best/n*1e6:7.1f} us/token, {n/best:7.1f} tok/s)",
              file=sys.stderr)

    ns = sorted(results)
    if len(ns) >= 2:
        # linear fit t = a + b*n
        A = np.stack([np.ones(len(ns)), np.asarray(ns, np.float64)], 1)
        y = np.asarray([results[n] for n in ns])
        (a, b), *_ = np.linalg.lstsq(A, y, rcond=None)
        sol = wbytes / 800e9  # v5e ~800 GB/s effective HBM
        print(f"per-program overhead: {a*1e3:.2f} ms; marginal "
              f"{b*1e6:.1f} us/token ({1/b:.0f} tok/s asymptotic)",
              file=sys.stderr)
        print(f"weights {wbytes/1e6:.0f} MB -> bandwidth speed-of-light "
              f"~{sol*1e6:.1f} us/token ({1/sol:.0f} tok/s); "
              f"marginal is {b/sol:.1f}x off", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Decode-step surgery bench: where do the non-matmul ms/token go?

benchmarks/bench_qmat.py shows the quantized matmuls alone run at HBM
speed-of-light (~4.1 ms/token at 2.6B) while the full decode loop measures
~8.2 ms/token (bench_decode.py).  This bench bisects the gap by timing a
scan of decode steps with individual components monkeypatched out:

  full       the real step (no sampling)
  no_attn    _attend returns zeros      -> attention einsum cost
  no_qdot    qdot returns zeros         -> everything-but-matmuls
  no_norms   _rms_norm/_rope identity   -> norm+rope VPU cost

Each variant rebuilds a FRESH jit (so the patch is traced), times chained
scans at two lengths, and reports the marginal per-token cost.

Usage: python benchmarks/bench_step.py [n_chain] [variants...]
Env: MIOTTS_BENCH_MODEL, MIOTTS_BENCH_QKV, MIOTTS_BENCH_CTX (default 1024).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import bench as benchmod
from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models import llm as llm_mod
from miotts_tpu.models.llm import (LLMConfig, init_kv_cache, llm_prefill,
                                   load_llm_params)

VARIANTS = ["full", "no_attn", "no_qdot", "no_norms", "no_kvwrite"]


def patched(name):
    """Context manager patching llm-module internals for one variant."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        saved = {}

        def patch(attr, fn):
            saved[attr] = getattr(llm_mod, attr)
            setattr(llm_mod, attr, fn)

        if name == "no_attn":
            patch("_attend",
                  lambda q, k, v, fill, pos, *a, **kw:
                  jnp.zeros((q.shape[0], q.shape[1],
                             q.shape[2] * q.shape[3]), q.dtype))
        elif name == "no_qdot":
            # stub must stay DATA-DEPENDENT on x: a zeros() stub makes every
            # downstream activation constant and XLA dead-code-eliminates
            # the whole step (measured 0.01 ms/token at batch 32)
            real = llm_mod.qdot
            patch("qdot", lambda x, w:
                  jnp.broadcast_to(jnp.mean(x, axis=-1, keepdims=True),
                                   (*x.shape[:-1], w.shape[-2])).astype(x.dtype)
                  if hasattr(w, "values") else real(x, w))
        elif name == "no_norms":
            patch("_rms_norm", lambda x, w, eps: x)
            patch("_rope", lambda x, pos, theta, style: x)
        elif name == "no_kvwrite":
            # skip the batched-decode cache scatter (B>1 path only):
            # isolates the per-step [L,B,H,S] scatter-write cost
            patch("_scatter_kv", lambda buf, p, upd: buf)
        try:
            yield
        finally:
            for attr, fn in saved.items():
                setattr(llm_mod, attr, fn)

    return cm()


def main() -> int:
    n_chain = 64
    names = []
    for a in sys.argv[1:]:
        if a.isdigit():
            n_chain = int(a)
        else:
            names.append(a)
    names = names or list(VARIANTS)

    llm_path, _, _ = benchmod.ensure_models()
    reader = GGUFReader(llm_path)
    cfg = LLMConfig.from_gguf(reader)
    params, _ = load_llm_params(reader, cfg, dtype=jnp.bfloat16)
    ctx = int(os.environ.get("MIOTTS_BENCH_CTX", "1024"))
    B = int(os.environ.get("MIOTTS_BENCH_BATCH", "1"))
    cache0 = init_kv_cache(cfg, B, ctx, dtype=jnp.bfloat16,
                           quantized=bool(os.environ.get("MIOTTS_BENCH_QKV")))
    toks = jnp.zeros((B, 64), jnp.int32)
    last, cache0 = llm_prefill(params, toks, jnp.full((B,), 8, jnp.int32),
                               cache0, cfg)
    print(f"model: {benchmod.MODEL} ({cfg.n_layers}L/{cfg.dim}d) ctx={ctx} batch={B}", file=sys.stderr)

    def unstack(params):
        """Stacked scan blocks -> per-layer list (the hybrid python-loop
        path): tests whether the scan's dynamic-slice of stacked weights
        forces a materialized copy before each pallas_call."""
        import dataclasses
        blocks = params["blocks"]
        L = cfg.n_layers
        layers = []
        for li in range(L):
            layers.append(jax.tree_util.tree_map(
                lambda leaf: leaf[li], blocks))
        p2 = {k: v for k, v in params.items() if k != "blocks"}
        p2["layers"] = layers
        cfg2 = dataclasses.replace(cfg, layer_types=("attn",) * L)
        return p2, cfg2

    def time_variant(name):
        vparams, vcfg = (unstack(params) if name == "unrolled"
                         else (params, cfg))
        with patched(name if name != "unrolled" else "full"):
            fwd = llm_mod.llm_forward.__wrapped__  # un-jitted

            def run_n(n):
                @jax.jit
                def run(vparams, cache):
                    def body(carry, i):
                        # tok couples to the previous logits AND a counter:
                        # every component stays loop-varying, so XLA cannot
                        # hoist a stubbed variant's body out of the scan
                        cache, tok = carry
                        pos = jnp.minimum(cache["fill"],
                                          ctx - 1)[:, None]
                        logits, cache = fwd(vparams, tok[:, None], pos,
                                            cache, vcfg)
                        cache = dict(cache, fill=jnp.minimum(
                            cache["fill"], ctx - 1))
                        tok = (jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                               + i) % vcfg.n_vocab
                        return (cache, tok), jnp.sum(logits) * 1e-20
                    (cache, _), ys = jax.lax.scan(
                        body, (cache, jnp.zeros((B,), jnp.int32)),
                        jnp.arange(n, dtype=jnp.int32))
                    return jnp.sum(ys)
                jax.device_get(run(vparams, cache0))
                best = float("inf")
                for _ in range(4):
                    t0 = time.perf_counter()
                    jax.device_get(run(vparams, cache0))
                    best = min(best, time.perf_counter() - t0)
                return best
            n1, n2 = max(4, n_chain // 4), n_chain
            t1, t2 = run_n(n1), run_n(n2)
            return (t2 - t1) / (n2 - n1)

    base = None
    for name in names:
        try:
            dt = time_variant(name)
        except Exception as e:  # pragma: no cover
            print(f"  {name:10s}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        extra = ""
        if name == "full":
            base = dt
        elif base is not None:
            extra = f"  (component ~{(base - dt) * 1e3:6.2f} ms/token)"
        print(f"  {name:10s}: {dt*1e3:7.2f} ms/token{extra}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

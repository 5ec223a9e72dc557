#!/usr/bin/env python3
"""Codec decode surgery bench: per-stage cost of the batched vmapped decode.

The batched-serving stage timers (bench_batch.py) show the codec decode is
~45% of serving wall at 32 slots; the FLOP count says it should be far
cheaper.  This bench times the full vmapped decode and each stage group in
isolation (fresh jits with the network truncated after each stage) to locate
the cost: prenet attention, conv_transpose upsampling, ResNet GroupNorm
chains, AdaLN decoder, upsampler stages, or the iSTFT.

Usage: python benchmarks/bench_codec.py [batch] [bucket]
Env: MIOTTS_CODEC_FAST=1 selects bf16-input matmuls (Precision.DEFAULT).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import bench as benchmod
from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models import codec as codec_mod
from miotts_tpu.models.codec import CodecConfig, load_codec_params

# Each truncation point is its own jit (slow remote compiles on the relay):
# default to the coarse group boundaries; pass stage names as extra argv to
# bisect finer (any tap name in models/codec.py works).
STAGES = ["token_embd", "prenet", "prior", "decoder", "post",
          "upsampler_1", "istft"]


def build_truncated(cfg, upto):
    """jit of the forward cut after stage `upto`: the full forward is
    traced, but only the tapped activation is returned, so XLA dead-code-
    eliminates every later stage.  `params` MUST be a function argument —
    as a closure constant the weights get embedded in the HLO literal
    payload (hundreds of MB), which the relay's remote_compile rejects
    (HTTP 413) and which slows every compile."""

    def fn(params, codes, emb, n_real):
        box = {}

        def tap(name, x):
            if name == upto and "out" not in box:
                box["out"] = x

        lm, ph = codec_mod._codec_forward(params, codes, emb, cfg, n_real,
                                          tap)
        if upto == "istft":
            from miotts_tpu.ops.istft import istft
            mag = jnp.clip(jnp.exp(lm), 0.0, 100.0)
            re = mag * jnp.cos(ph)
            im = mag * jnp.sin(ph)
            return istft(re, im, params["istft_cos_basis"],
                         params["istft_sin_basis"], params["istft_hann"],
                         cfg.hop_length, None)
        return box["out"]

    return jax.jit(jax.vmap(fn, in_axes=(None, 0, 0, 0)))


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    stages = sys.argv[3:] or STAGES
    print(f"bench_codec: devices = {jax.devices()}", file=sys.stderr)
    _, codec_path, _ = benchmod.ensure_models()
    r = GGUFReader(codec_path)
    params, cfg = load_codec_params(r)
    r.close()

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 12800, (B, T)), jnp.int32)
    embs = jnp.asarray(rng.standard_normal((B, cfg.adaln_dim)), jnp.float32)
    n_real = jnp.full((B,), T - 8, jnp.int32)

    def timeit(fn, *args):
        # np.asarray of a scalar reduction, NOT block_until_ready: the
        # relay backend's block_until_ready returns before the program
        # finishes (measured 0.1 ms for a 125 ms decode), while fetching a
        # scalar genuinely synchronizes and transfers 4 bytes.
        red = jax.jit(lambda *a: jnp.sum(fn(*a)))
        float(np.asarray(red(*args)))         # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(red(*args)))
            best = min(best, time.perf_counter() - t0)
        return best

    prev = 0.0
    print(f"bench_codec: B={B} T={T} "
          f"fast={bool(os.environ.get('MIOTTS_CODEC_FAST'))}",
          file=sys.stderr)
    for st in stages:
        fn = build_truncated(cfg, st)
        sec = timeit(fn, params, codes, embs, n_real)
        print(f"  upto {st:<14} {sec * 1e3:8.2f} ms  "
              f"(+{(sec - prev) * 1e3:7.2f} ms)", file=sys.stderr, flush=True)
        prev = sec
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Microbench: fused decode-attention kernel vs the XLA path on real TPU.

Times N chained decode-attention calls inside ONE jitted scan, so relay
dispatch latency (ms-scale on this tunneled chip) does not pollute the
per-call number.  Shapes are per-layer 2.6B serving shapes.

Usage: python benchmarks/bench_attn.py [B] [S]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

# _attend takes its XLA path by default (the kernel gate is opt-in);
# decode_attention is called directly for the kernel timings.
os.environ.pop("MIOTTS_ATTN_KERNEL", None)

from miotts_tpu.models.llm import _attend, _kv_quantize
from miotts_tpu.ops.decode_attn import decode_attention, decode_attention_batched

def chained(fn_one, q0):
    """Marginal per-call cost: time N=64 and N=256 chained calls and take
    the slope.  Each run on this relay carries a ~25 ms fixed cost that
    scales with the captured buffer set, which single-N timing misreads as
    per-call cost."""
    times = {}
    for n in (64, 256):
        @jax.jit
        def run(q, n=n):
            def body(c, _):
                out = fn_one(c)
                return c + out.astype(c.dtype) * 1e-6, ()
            c, _ = jax.lax.scan(body, q, None, length=n)
            return c

        run(q0).block_until_ready()   # compile
        run(q0).block_until_ready()   # absorb first-exec relay stall
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(q0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[256] - times[64]) / (256 - 64)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    H, H_kv, D = 32, 8, 80  # 2.6B shapes
    L = 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H_kv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H_kv, S, D)), jnp.bfloat16)
    kq, ks = _kv_quantize(k.astype(jnp.float32))
    vq, vs = _kv_quantize(v.astype(jnp.float32))
    fill = jnp.full((B,), S, jnp.int32)
    q_pos = fill - 1

    # The SERVING chunk's attention reads three sources (models/llm.py
    # _attend): the big cache, the chunk buffer (W columns, deferred
    # per-chunk merge), and the current token's k/v — the XLA path
    # concatenates their scores before one softmax.  These variants time
    # that exact shape (W = 20 = chunk_steps), which the plain cache-only
    # variants below do NOT cover: the r4 bench_step surgery measured the
    # full serve-path attention at 16.5 ms/step @B=128 while cache-only
    # microbenches imply ~3-4 ms — the delta must be located before any
    # kernel work (VERDICT r4 item 2).
    def _env(nocat, bkern=""):
        """Set the _attend trace-time env gates for the variant about to
        trace; returns None so `_env(..) or expr` evaluates expr."""
        for name, v in (("MIOTTS_ATTN_NOCAT", nocat),
                        ("MIOTTS_ATTN_BKERNEL", bkern)):
            if v:
                os.environ[name] = v
            else:
                os.environ.pop(name, None)

    W = 20
    k_buf = jnp.asarray(rng.standard_normal((B, H_kv, W, D)), jnp.bfloat16)
    v_buf = jnp.asarray(rng.standard_normal((B, H_kv, W, D)), jnp.bfloat16)
    buf_valid = jnp.ones((B, W), bool)
    k_cur = jnp.asarray(rng.standard_normal((B, 1, H_kv, D)), jnp.bfloat16)
    v_cur = jnp.asarray(rng.standard_normal((B, 1, H_kv, D)), jnp.bfloat16)

    from miotts_tpu.ops.decode_attn import _dma_floor
    cases = {
        "dma_floor": lambda c: c + _dma_floor(c, k, v).mean().astype(c.dtype),
        "xla_bf16": lambda c: _attend(
            c[:, None], k, v, fill, q_pos[:, None]).reshape(B, H, D),
        "xla_int8": lambda c: _attend(
            c[:, None], kq, vq, fill, q_pos[:, None], ks, vs).reshape(B, H, D),
        "serve_bf16": lambda c: _env("") or _attend(
            c[:, None], k, v, fill, q_pos[:, None],
            k_cur=k_cur, v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
            buf_valid=buf_valid).reshape(B, H, D),
        "serve_int8": lambda c: _env("") or _attend(
            c[:, None], kq, vq, fill, q_pos[:, None], ks, vs,
            k_cur=k_cur, v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
            buf_valid=buf_valid).reshape(B, H, D),
        # no-concatenate flash merge (MIOTTS_ATTN_NOCAT, set at trace time
        # by _env below — the serve variants above clear it)
        "servnc_bf16": lambda c: _env("1") or _attend(
            c[:, None], k, v, fill, q_pos[:, None],
            k_cur=k_cur, v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
            buf_valid=buf_valid).reshape(B, H, D),
        "servnc_int8": lambda c: _env("1") or _attend(
            c[:, None], kq, vq, fill, q_pos[:, None], ks, vs,
            k_cur=k_cur, v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
            buf_valid=buf_valid).reshape(B, H, D),
        # the round-5 batch-tiled kernel INSIDE the real serve path (cache
        # part in-kernel, buf/cur flash-merged; models/llm.py _attend_bkernel)
        "servbk_bf16": lambda c: _env("", "1") or _attend(
            c[:, None], k, v, fill, q_pos[:, None],
            k_cur=k_cur, v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
            buf_valid=buf_valid).reshape(B, H, D),
        "servbk_int8": lambda c: _env("", "1") or _attend(
            c[:, None], kq, vq, fill, q_pos[:, None], ks, vs,
            k_cur=k_cur, v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
            buf_valid=buf_valid).reshape(B, H, D),
        "kern_bf16": lambda c: _env("") or decode_attention(
            c, k, v, fill, q_pos),
        "kern_int8": lambda c: _env("") or decode_attention(
            c, kq, vq, fill, q_pos, ks, vs),
    }
    # Batch-tiled round-5 kernel (decode_attention_batched): B_T rows per
    # grid cell; the int8 variant feeds the MXU integers (no per-element
    # cache dequant).  MIOTTS_ATTN_BTILE sweeps the tile.
    bt = int(os.environ.get("MIOTTS_ATTN_BTILE", "8"))
    if B % bt == 0:
        cases["bkern_bf16"] = lambda c: decode_attention_batched(
            c, k, v, fill, q_pos, b_tile=bt)
        cases["bkern_int8"] = lambda c: decode_attention_batched(
            c, kq, vq, fill, q_pos, ks, vs, b_tile=bt)
    bytes_bf16 = 2 * B * H_kv * S * D * 2
    bytes_int8 = 2 * B * H_kv * S * (D + 4)
    for name, fn in cases.items():
        nbytes = bytes_int8 if "int8" in name else bytes_bf16
        dt = chained(fn, q)
        print(f"{name:10s} B={B} S={S}: {dt*1e6:8.1f} us/layer-call "
              f"({nbytes/dt/1e9:6.1f} GB/s cache read, "
              f"x{L} layers = {dt*L*1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

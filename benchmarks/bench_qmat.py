#!/usr/bin/env python3
"""Microbench: fused dequant GEMV (ops/qmat.py) vs HBM speed-of-light.

The decode hot loop is M=1 quantized matmuls; benchmarks/bench_decode.py
puts the 2.6B marginal cost ~2x above the weight-bandwidth floor.  This
bench isolates WHERE: per 2.6B-layer matmul shape it times, inside ONE
jitted scan (relay dispatch ~25 ms would otherwise swamp the numbers):

  pallas      the production kernel (int8 values + f32 scales)
  pallas_bf16s  bf16 scales storage (12.5% -> 6% scale traffic)
  pallas_bf16   dequant + dot in bf16 (halves VPU multiply width)
  packed      nibble-packed values (halved value traffic, VPU unpack)
  xla         dequant-then-dot fallback
  dma_floor   same block streaming, no dequant/dot (bandwidth bound)

Usage: python benchmarks/bench_qmat.py [n_chain]
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

from miotts_tpu.ops.qmat import (QTensor, _qdot_group_pallas, _qdot_pallas,
                                 _qdot_xla)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:
    pl = None

# 2.6B per-layer decode shapes (K, N): fused QKV, O, fused gate+up, down
SHAPES = [(2560, 3840), (2560, 2560), (2560, 16384), (8192, 2560)]
GROUP = 32


def make_qt(K, N, scale_dtype=jnp.float32, packed=False, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 16, (K, N), dtype=np.int64).astype(np.int8)
    s = (rng.random((K // GROUP, N), np.float32) * 0.02 + 0.01)
    m = (rng.random((K // GROUP, N), np.float32) * 0.01)
    qt = QTensor(values=jnp.asarray(v), scales=jnp.asarray(s, scale_dtype),
                 mins=jnp.asarray(m, scale_dtype), group=GROUP, n_out=N)
    if packed:
        qt = qt.pack4()
    return qt


def dma_floor(x, qt):
    """Stream the same value+scale blocks, minimal math (no dequant/dot)."""
    K, N = qt.values.shape
    TILE_N = 512 if N % 512 == 0 else 256
    TILE_K = K
    while TILE_N * TILE_K > 512 * 1024 and TILE_K % 2 == 0 \
            and (TILE_K // 2) % 256 == 0:
        TILE_K //= 2
    n_k = K // TILE_K

    def kern(v_ref, s_ref, o_ref, acc_ref):
        k_idx = pl.program_id(1)

        @pl.when(k_idx == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] += (v_ref[:8, :].astype(jnp.float32)
                       + s_ref[:8, :].astype(jnp.float32))

        @pl.when(k_idx == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:]

    out = pl.pallas_call(
        kern,
        grid=(N // TILE_N, n_k),
        in_specs=[
            pl.BlockSpec((TILE_K, TILE_N), lambda i, j: (j, i)),
            pl.BlockSpec((TILE_K // GROUP, TILE_N), lambda i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((8, TILE_N), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, TILE_N), jnp.float32)],
    )(qt.values, qt.scales)
    return out[:1]


def bytes_of(qt):
    n = qt.values.nbytes + qt.scales.nbytes
    if qt.mins is not None:
        n += qt.mins.nbytes
    return n


def time_layer_chained(fns, x0s, n_chain, reps=5):
    """Marginal per-pseudo-layer seconds: each scan iteration applies every
    (fn, x) pair once, coupled through the carry; slope over two chain
    lengths removes the fixed dispatch/relay cost."""
    def run_n(n):
        @jax.jit
        def run(xs):
            def body(c, _):
                for fn, x in zip(fns, xs):
                    c = c + jnp.sum(fn(x * c)) * 1e-20
                return c, ()
            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=n)
            return c
        jax.device_get(run(x0s))  # compile+sync (relay: b_u_r returns early)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(run(x0s))
            best = min(best, time.perf_counter() - t0)
        return best
    n1, n2 = max(4, n_chain // 4), n_chain
    t1, t2 = run_n(n1), run_n(n2)
    return (t2 - t1) / (n2 - n1)


def prefill_check(M: int) -> int:
    """Mosaic-validate the M-tiled kernel at batched-prefill shapes
    (M = slots x prompt bucket): compile + run packed and unpacked once,
    check they agree, and time a few reps.  VERDICT r2 item 3."""
    rng = np.random.default_rng(2)
    for K, N in SHAPES:
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.float32)
        qt = make_qt(K, N)
        qp = make_qt(K, N, packed=True)
        outs = {}
        for tag, q in (("unpacked", qt), ("packed", qp)):
            try:
                y = _qdot_pallas(x, q)
                y.block_until_ready()
                t0 = time.perf_counter()
                for _ in range(3):
                    y = _qdot_pallas(x, q)
                jax.device_get(jnp.sum(y))
                dt = (time.perf_counter() - t0) / 3
                outs[tag] = np.asarray(y[:8, :128])
                print(f"  [{K:5d}x{N:5d}] M={M} {tag:8s}: OK {dt*1e3:8.2f} ms"
                      f" ({2*M*K*N/dt/1e12:5.1f} TFLOP/s)", file=sys.stderr)
            except Exception as e:
                print(f"  [{K:5d}x{N:5d}] M={M} {tag:8s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
                return 1
        if not np.allclose(outs["packed"], outs["unpacked"], atol=2e-2,
                           rtol=2e-2):
            print("  MISMATCH packed vs unpacked", file=sys.stderr)
            return 1
    print(f"prefill_check M={M}: all shapes OK, packed==unpacked",
          file=sys.stderr)
    return 0


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--prefill":
        return prefill_check(int(sys.argv[2]))
    n_chain = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(1)
    xs = tuple(jnp.asarray(rng.standard_normal((1, K)), jnp.float32)
               for K, _ in SHAPES)

    def build(name):
        if name == "pallas":
            qts = [make_qt(K, N) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas(x, qt) for qt in qts]
        elif name == "pallas_bf16s":
            qts = [make_qt(K, N, jnp.bfloat16) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas(x, qt) for qt in qts]
        elif name == "packed":
            qts = [make_qt(K, N, packed=True) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas(x, qt) for qt in qts]
        elif name == "packed_bf16s":
            qts = [make_qt(K, N, jnp.bfloat16, packed=True)
                   for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas(x, qt) for qt in qts]
        elif name == "packed_bf16after":
            # round-3: dequant in f32 (native lanes), ONE cast to bf16 at
            # the MXU boundary — tests the f32-MXU-emulation hypothesis
            qts = [make_qt(K, N, packed=True) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas(
                x, qt, bf16_dot="after") for qt in qts]
        elif name == "bf16after":
            qts = [make_qt(K, N) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas(
                x, qt, bf16_dot="after") for qt in qts]
        elif name == "packed_bf16dot":
            # round-3: dequant + dot in bf16 (native MXU path, half-width
            # VPU ops); same numerics class as the XLA bf16 fallback
            qts = [make_qt(K, N, packed=True) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas(
                x.astype(jnp.bfloat16), qt, bf16_dot=True) for qt in qts]
        elif name == "packed_bf16dot_bf16s":
            qts = [make_qt(K, N, jnp.bfloat16, packed=True)
                   for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas(
                x.astype(jnp.bfloat16), qt, bf16_dot=True) for qt in qts]
        elif name == "bf16dot":
            # unpacked int8 values, bf16 dequant+dot (for Q8_0/Q6_K models)
            qts = [make_qt(K, N) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas(
                x.astype(jnp.bfloat16), qt, bf16_dot=True) for qt in qts]
        elif name == "packed_split":
            # round-3: pre-split x halves, no unpack concat, two half-K dots
            from miotts_tpu.ops.qmat import _qdot_pallas_split
            qts = [make_qt(K, N, packed=True) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas_split(x, qt) for qt in qts]
        elif name == "packed_split_bf16s":
            from miotts_tpu.ops.qmat import _qdot_pallas_split
            qts = [make_qt(K, N, jnp.bfloat16, packed=True)
                   for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_pallas_split(x, qt) for qt in qts]
        elif name == "groupdot_packed":
            # round-3 combination: nibble-packed values, unpack straight to
            # bf16, scales applied to the [G, N] partial sums (no per-weight
            # scale multiply, no f32 intermediate)
            qts = [make_qt(K, N, packed=True) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_group_pallas(
                x.astype(jnp.bfloat16), qt) for qt in qts]
        elif name == "groupdot_packed_bf16s":
            qts = [make_qt(K, N, jnp.bfloat16, packed=True)
                   for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_group_pallas(
                x.astype(jnp.bfloat16), qt) for qt in qts]
        elif name == "groupdot":
            # scale-after-dot GEMV kernel (bf16 activations)
            qts = [make_qt(K, N) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_group_pallas(
                x.astype(jnp.bfloat16), qt) for qt in qts]
        elif name == "groupdot_bf16s":
            qts = [make_qt(K, N, jnp.bfloat16) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_group_pallas(
                x.astype(jnp.bfloat16), qt) for qt in qts]
        elif name == "w8a8":
            # round-4: int8 activations x int8 weights -> int32 MXU dot,
            # scales after (no per-weight VPU convert at all)
            from miotts_tpu.ops.qmat import _qdot_w8a8_pallas
            qts = [make_qt(K, N) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_w8a8_pallas(x, qt) for qt in qts]
        elif name == "w8a8_packed":
            from miotts_tpu.ops.qmat import _qdot_w8a8_pallas
            qts = [make_qt(K, N, packed=True) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_w8a8_pallas(x, qt) for qt in qts]
        elif name == "xla":
            qts = [make_qt(K, N) for K, N in SHAPES]
            fns = [lambda x, qt=qt: _qdot_xla(x, qt) for qt in qts]
        elif name == "dma_floor":
            qts = [make_qt(K, N) for K, N in SHAPES]
            fns = [lambda x, qt=qt: dma_floor(x, qt) for qt in qts]
        return fns, sum(bytes_of(q) for q in qts)

    names = sys.argv[2:] or ["pallas", "pallas_bf16s", "groupdot",
                             "groupdot_bf16s", "packed", "xla", "dma_floor"]
    for name in names:
        fns, nbytes = build(name)
        try:
            dt = time_layer_chained(fns, xs, n_chain)
        except Exception as e:  # pragma: no cover
            print(f"  {name:13s}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        gbs = nbytes / dt / 1e9
        print(f"  {name:13s}: {dt*1e6:8.1f} us/layer ({gbs:6.1f} GB/s eff)"
              f" -> {dt*32*1e3:6.2f} ms/token @2.6B", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

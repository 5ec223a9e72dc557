"""Quantized weight tensors on device + fused dequant matmul.

TPU-native replacement for ggml's quantized matmul (SURVEY.md §2.2): GGUF
block formats are repacked once at load into a planar layout (gguf/quants.py)
and live in HBM as int8 values + per-group scales.  The matmul dequantizes
inside the kernel, so weight bytes read from HBM stay at ~1 byte/element —
the decode GEMV is HBM-bandwidth-bound, which makes this the difference
between Q4 being 4x faster than f32 or not.

Device layout: values are stored TRANSPOSED as [K, N] (contraction dim
first) with scales [K/g, N].  Two reasons, both TPU-specific:
  * the quant group then runs along the SUBLANE axis, so the in-kernel
    dequant reshape [K_t, N] -> [K_t/g, g, N] keeps the lane dim intact
    (Mosaic rejects lane-splitting reshapes);
  * the matmul needs no transposition: y = x[M, K] @ w[K, N].

Two execution paths:
  * XLA path (`_qdot_xla`): dequant then dot; XLA fuses.  Used on CPU
    (tests) and as fallback.
  * Pallas path (`_qdot_pallas`): VMEM-tiled kernel, dequant fused ahead of
    the MXU dot, guaranteed no materialized f32 weight copy in HBM.

`QTensor` is a registered pytree so quantized weights pass through jit/scan
like ordinary arrays.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas imports fail gracefully on unsupported platforms
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from ..gguf.quants import GroupQuant


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Group-affine quantized matrix, logical shape [out=N, in=K], stored
    transposed.  dequant: w[k, n] = values[k, n] * scales[k//g, n]
    - mins[k//g, n]; y = x @ w."""
    values: jax.Array            # int8 [K, N_pad], or uint8 [K//2, N_pad]
                                 #   when packed: two nibbles per byte,
                                 #   split per quant group (low = row r,
                                 #   high = row r + g/2 within each group)
                                 #   so the unpack is a per-group block
                                 #   concat (no sublane interleave) and
                                 #   survives any group-aligned K tiling
    scales: jax.Array            # f32   [K // group, N_pad]
    mins: jax.Array | None       # f32   [K // group, N_pad] or None
    group: int
    n_out: int = -1              # logical output dim (un-padded N)
    packed: bool = False         # 4-bit nibble packing (halves value HBM)

    @property
    def shape(self):
        """Logical [N, K] (matching the dense GGUF Linear layout)."""
        k, n = self.values.shape[-2:]
        if self.packed:
            k *= 2
        n = self.n_out if self.n_out > 0 else n
        return (*self.values.shape[:-2], n, k)

    def tree_flatten(self):
        leaves = [self.values, self.scales]
        if self.mins is not None:
            leaves.append(self.mins)
        return leaves, (self.group, self.mins is not None, self.n_out,
                        self.packed)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        group, has_mins, n_out, packed = aux
        values, scales = leaves[0], leaves[1]
        mins = leaves[2] if has_mins else None
        return cls(values=values, scales=scales, mins=mins, group=group,
                   n_out=n_out, packed=packed)

    @classmethod
    def from_group_quant(cls, gq: GroupQuant, scale_dtype=jnp.float32) -> "QTensor":
        n, k = gq.values.shape
        n_pad = (-n) % 128  # pad the lane (output) dim for TPU tiling
        def pad_t(a):
            at = np.ascontiguousarray(a.T)
            if n_pad:
                at = np.pad(at, ((0, 0), (0, n_pad)))
            return at
        return cls(
            values=jnp.asarray(pad_t(gq.values)),
            scales=jnp.asarray(pad_t(gq.scales), scale_dtype),
            mins=None if gq.mins is None else jnp.asarray(
                pad_t(gq.mins), scale_dtype),
            group=gq.group,
            n_out=n,
        )

    def _unpacked_values(self):
        """int values [K, N] (unpacks nibbles when `packed`)."""
        if not self.packed:
            return self.values
        g = self.group
        kh, n = self.values.shape
        v = self.values.astype(jnp.int32).reshape(kh * 2 // g, g // 2, n)
        lo = v & 0xF
        hi = (v >> 4) & 0xF
        return jnp.concatenate([lo, hi], axis=1).reshape(kh * 2, n)

    def dequant_t(self, dtype=jnp.float32) -> jax.Array:
        """Dequantized weight in storage orientation [K, N] (un-padded)."""
        vals = self._unpacked_values()
        k, n = vals.shape
        g = self.group
        v = vals.astype(dtype).reshape(k // g, g, n)
        w = v * self.scales.astype(dtype)[:, None, :]
        if self.mins is not None:
            w = w - self.mins.astype(dtype)[:, None, :]
        w = w.reshape(k, n)
        if self.n_out > 0 and self.n_out != n:
            w = w[:, : self.n_out]
        return w

    def pack4(self) -> "QTensor":
        """Convert to packed-nibble storage (Q4 formats only): values become
        uint8 [K/2, N] holding two 4-bit quants; centered formats (Q4_0's
        q-8) fold the offset into the `mins` term so nibbles are unsigned.
        Halves the dominant HBM read of the decode GEMV."""
        if self.packed:
            return self
        v = np.asarray(self.values).astype(np.int32)
        k, n = v.shape
        assert k % 2 == 0
        vmin = int(v.min())
        scales = self.scales
        mins = self.mins
        if vmin < 0:
            # centered quants: w = s*(q) with q in [-8, 7] -> biased q+8 with
            # min term 8*s
            assert vmin >= -8 and int(v.max()) <= 7, "not a 4-bit format"
            v = v + 8
            extra = self.scales * 8.0
            mins = extra if mins is None else mins + extra
        assert 0 <= int(v.min()) and int(v.max()) <= 15, "not a 4-bit format"
        g = self.group
        v3 = v.reshape(k // g, g, n)
        packed = (v3[:, : g // 2] | (v3[:, g // 2:] << 4))
        packed = packed.reshape(k // 2, n).astype(np.uint8)
        return QTensor(values=jnp.asarray(packed), scales=scales, mins=mins,
                       group=self.group, n_out=self.n_out, packed=True)

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        """Dequantized weight in logical [N, K] orientation (tests/debug)."""
        return self.dequant_t(dtype).T


def _use_pallas() -> bool:
    if os.environ.get("MIOTTS_FORCE_XLA_QDOT"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------

def _qdot_xla(x: jax.Array, qt: QTensor) -> jax.Array:
    """x [M, K] @ w [K, N] -> [M, N].  Dequant then dot; XLA fuses."""
    w = qt.dequant_t(jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16)
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas path
# ---------------------------------------------------------------------------

def _qdot_kernel(x_ref, v_ref, s_ref, o_ref, acc_ref, *, group, n_k_tiles,
                 packed, bf16_dot=False):
    """Grid (m_tiles, n_tiles, k_tiles).  Blocks: x [M_t, K_t], v int8
    [K_t, N_t] (or uint8 [K_t/2, N_t] nibble-packed), s [K_t//g, N_t],
    out [M_t, N_t], acc f32 scratch [M_t, N_t].

    `bf16_dot` (round 3): dequantize and dot in bf16 — halves the VPU
    convert/multiply width and uses the MXU's native bf16 path instead of
    the multi-pass f32 emulation.  Accumulation stays f32.  Numerically
    this is the SAME class as the XLA fallback already computes for bf16
    activations (_qdot_xla dequantizes to bf16 there): w rounds to bf16
    after the scale multiply, ~2^-8 relative — an order below the Q4/Q6
    quantization noise itself.  Selected only for bf16 activations."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # bf16_dot: False = all-f32; True = dequant AND dot in bf16 (measured
    # slow: 16-bit elementwise implies retiling); "after" = dequant in f32
    # (native 32-bit lanes), ONE cast to bf16 right before the MXU — pays
    # +1 VPU op/weight to drop the multi-pass f32 MXU emulation.
    wdt = jnp.bfloat16 if bf16_dot is True else jnp.float32
    if packed:
        vp = v_ref[:].astype(jnp.int32)
        kh, n_t = vp.shape
        k_t = kh * 2
        v3 = vp.reshape(k_t // group, group // 2, n_t)
        lo = v3 & 0xF
        hi = v3 >> 4          # u8 widen zero-extends: no mask needed
        # per-group half-split order -> unpack is a group-local block
        # concat (no sublane interleave)
        v = jnp.concatenate([lo, hi], axis=1).reshape(k_t, n_t).astype(wdt)
    else:
        v = v_ref[:].astype(wdt)
        k_t, n_t = v.shape
    s = s_ref[:].astype(wdt)
    # dequant: group runs along sublanes; lane dim (N_t) untouched
    w = (v.reshape(k_t // group, group, n_t) * s[:, None, :]).reshape(k_t, n_t)
    xk = x_ref[:]
    if bf16_dot == "after":
        w = w.astype(jnp.bfloat16)
        xk = xk.astype(jnp.bfloat16)
    elif bf16_dot is True:
        xk = xk.astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        xk, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _qdot_split_kernel(xlo_ref, xhi_ref, v_ref, s_ref, o_ref, acc_ref, *,
                       group, n_k_tiles):
    """Packed-nibble matmul WITHOUT the unpack concat (round 3).

    The standard packed kernel pays, per weight: u8->i32 widen, nibble
    extract, a [G, g/2, N]->[K, N] block CONCAT (a real sublane relayout),
    convert, scale multiply.  Here the activation row is pre-split OUTSIDE
    the kernel (x is [M, K] — tiny) into the lo-half and hi-half columns of
    every quant group, so each nibble half is dequantized IN PLACE and
    contracted by its own half-K dot: no concat, and `hi = vp >> 4` needs
    no mask (the u8 widen zero-extends).  Exact: integer nibbles and f32
    scales/products, f32 accumulation.

    Blocks: xlo/xhi [M_t, K_t/2] f32, v uint8 [K_t/2, N_t],
    s [K_t//g, N_t], out/acc [M_t, N_t] f32."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vp = v_ref[:].astype(jnp.int32)            # [K_t/2, N_t], 0..255
    kh, n_t = vp.shape
    g2 = group // 2
    v3 = vp.reshape(kh // g2, g2, n_t)
    s = s_ref[:].astype(jnp.float32)[:, None, :]
    w_lo = ((v3 & 0xF).astype(jnp.float32) * s).reshape(kh, n_t)
    w_hi = ((v3 >> 4).astype(jnp.float32) * s).reshape(kh, n_t)
    acc_ref[:] += (
        jax.lax.dot_general(xlo_ref[:], w_lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(xhi_ref[:], w_hi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _qdot_group_kernel(x_ref, v_ref, s_ref, o_ref, acc_ref, *, group,
                       n_k_tiles, packed=False):
    """GEMV (M=1) variant that applies quant scales AFTER the dot.

    The standard kernel's VPU dequant is 2 ops/weight (int8->f32 convert +
    scale multiply) — measured to be the M=1 pole: shrinking scale bytes
    12.5%->6% (bf16 scales) moved the 2.6B marginal 0% because the HBM read
    was hiding behind the VPU work.  Here each quant group is contracted
    SEPARATELY: the x row is expanded block-diagonally to [G, K_t]
    (xb[g, k] = x[k] iff k//group == g), one dot yields per-group partial
    sums d [G, N_t], and the scale rides d (2/group ops per weight) instead
    of the weights (1/weight).  MXU cost is identical to the plain GEMV:
    G <= 128 rows land in the same padded 128-sublane M-block the M=1 dot
    already wastes.  bf16 is exact here: int8 values and bf16-sourced
    activations are represented exactly, products accumulate in f32.

    With `packed` (round 3): v is uint8 [K_t/2, N_t] nibble-packed and the
    unpack goes STRAIGHT to bf16 (& / >> / per-group block concat, no f32
    intermediate and no per-weight scale multiply at all) — the
    VPU-cheapest exact path measured for the 2.6B decode GEMV.  All values
    are small ints (|v| <= 127, nibbles 0..15), exactly representable in
    bf16; products accumulate in f32 on the MXU.

    Blocks: x [1, K_t] bf16, v int8 [K_t, N_t] (or uint8 [K_t/2, N_t]
    packed), s [K_t//g, N_t], out/acc [1, N_t] f32."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if packed:
        # Mosaic has no direct u8->bf16 cast; widen to i32 for the bitwise
        # unpack (same as the plain packed kernel), convert once to bf16
        vp = v_ref[:].astype(jnp.int32)        # uint8 [K_t/2, N_t] widened
        kh, n_t = vp.shape
        k_t = kh * 2
        v3 = vp.reshape(k_t // group, group // 2, n_t)
        lo = (v3 & 0xF).astype(jnp.bfloat16)
        hi = (v3 >> 4).astype(jnp.bfloat16)
        v = jnp.concatenate([lo, hi], axis=1).reshape(k_t, n_t)
    else:
        v = v_ref[:].astype(jnp.bfloat16)      # [K_t, N_t]
    k_t = v.shape[0]
    g_rows = k_t // group
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (g_rows, k_t), 1)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (g_rows, k_t), 0)
    # block-diagonal indicator WITHOUT bool vectors: an i1-valued [G, K_t]
    # mask trips a Mosaic relayout bug on v5e ("Non-singleton logical
    # dimension is replicated in destination but not in source"), so the
    # indicator is built in integer arithmetic and multiplied in
    ind = jnp.clip(1 - jnp.abs(k_ids // group - g_ids), 0, 1)
    xb = (jnp.broadcast_to(x_ref[:], (g_rows, k_t))
          * ind.astype(jnp.bfloat16))          # [G, K_t]
    d = jax.lax.dot_general(xb, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [G, N_t]
    acc_ref[:] += jnp.sum(d * s_ref[:].astype(jnp.float32), axis=0,
                          keepdims=True)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _qdot_w8a8_kernel(xb_ref, sx_ref, v_ref, s_ref, o_ref, acc_ref, *,
                      n_k_tiles):
    """W8A8 GEMV (round 4): int8 activations x int8 weights on the MXU.

    Every prior kernel family converts each weight to f32/bf16 on the VPU
    before the dot — measured to be the M=1 pole (bf16-scales A/B moved the
    marginal 0%, RESULTS.md).  Here the weights go from HBM to the MXU as
    INTEGERS: the activation row is quantized per quant-group to int8
    outside the kernel (one f32 scale per group), expanded block-diagonally
    (like _qdot_group_kernel), and contracted with the raw int8 values in an
    int8 x int8 -> int32 MXU dot.  Per-group scales (weight scale s[G, n] x
    activation scale sx[G]) ride the [G, N] int32 partials — 2/group VPU ops
    per weight instead of 2/weight.

    Accuracy: the int8 activation quantization adds ~0.3% RMS relative
    error on top of f32-exact dequant — an order below the Q4/Q6 weight
    quantization noise (bounded in tests/test_qmat.py).  The mins term
    (affine formats) is computed OUTSIDE with the dequantized activations,
    so the total error rides the centered weights (see _qdot_w8a8_pallas).

    Matches the reference hot loop /root/reference/src/test-to-speech.cpp:
    164-192 (llama.cpp's quantize-activations-then-integer-dot strategy,
    re-expressed for the MXU).

    The block-diagonal expansion of the quantized activation row is built
    OUTSIDE the kernel: this Mosaic has NO 8-bit elementwise arithmetic
    (arith.muli / arith.shrui on vector<i8> fail to legalize — measured
    round 4, qmat_r4 log), so an in-kernel int8 indicator multiply is
    impossible, and XLA builds the [K//g, K] int8 expansion once per call.
    The kernel re-reads its diagonal block per N tile (~+3-6% HBM traffic);
    in exchange the kernel body is a PURE int8 MXU dot + scale ride.

    Blocks: xb int8 [K_t//g, K_t] (diagonal block (j, j)), sx f32
    [K_t//g, 128] (lane-replicated), v int8 [K_t, N_t], s f32 [K_t//g, N_t],
    out/acc f32 [1, N_t]."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    d = jax.lax.dot_general(xb_ref[:], v_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)  # [G, N_t]
    scale = s_ref[:].astype(jnp.float32) * sx_ref[:, 0:1]
    acc_ref[:] += jnp.sum(d.astype(jnp.float32) * scale, axis=0,
                          keepdims=True)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _qdot_w8a8_packed_kernel(xblo_ref, xbhi_ref, sx_ref, v_ref, s_ref, o_ref,
                             acc_ref, *, n_k_tiles):
    """W8A8 GEMV over nibble-packed values — the no-concat split structure
    of _qdot_split_kernel fused with the int8 MXU dot of _qdot_w8a8_kernel.

    The nibble unpack widens to i32 (Mosaic has no 8-bit bitwise ops, see
    _qdot_w8a8_kernel) but truncates straight back to int8 for the MXU —
    no int->float convert, no per-weight scale multiply, no unpack concat.
    The quantized activation row is pre-split outside into the lo/hi nibble
    halves of every group (matching the byte layout: byte row r of group b
    holds w[b*g + r] lo / w[b*g + g/2 + r] hi) and expanded
    block-diagonally at half-group granularity, also outside; each half is
    contracted with its nibble plane in an int8 MXU dot and the two [G, N]
    int32 partials sum before the scales ride them.

    Blocks: xblo/xbhi int8 [K_t//g, K_t/2] (diagonal block (j, j)), sx f32
    [K_t//g, 128], v uint8 [K_t/2, N_t], s f32 [K_t//g, N_t], out/acc f32
    [1, N_t]."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vp = v_ref[:].astype(jnp.int32)                # uint8 [K_t/2, N_t] widened
    w_lo = (vp & 0xF).astype(jnp.int8)             # trunci back to 8-bit for
    w_hi = (vp >> 4).astype(jnp.int8)              #   the integer MXU feed
    d = (jax.lax.dot_general(xblo_ref[:], w_lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
         + jax.lax.dot_general(xbhi_ref[:], w_hi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32))  # [G, N_t]
    scale = s_ref[:].astype(jnp.float32) * sx_ref[:, 0:1]
    acc_ref[:] += jnp.sum(d.astype(jnp.float32) * scale, axis=0,
                          keepdims=True)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("interpret",))
def _qdot_w8a8_pallas(x: jax.Array, qt: QTensor,
                      interpret: bool = False) -> jax.Array:
    """W8A8 GEMV path (see _qdot_w8a8_*_kernel).  x [1, K].

    The activation row is quantized OUTSIDE the kernel, once per layer call
    (K elements of VPU work vs K*N inside): per quant-group symmetric int8
    with an f32 scale, so the in-kernel dot is pure int8 MXU work."""
    M, K = x.shape
    if M != 1:
        raise ValueError(f"_qdot_w8a8_pallas is a GEMV kernel (M=1), got M={M}")
    N = qt.values.shape[1]
    g = qt.group
    pack_div = 2 if qt.packed else 1
    TILE_N = 512 if N % 512 == 0 else (256 if N % 256 == 0 else 128)
    TILE_K = K
    k_align = max(128, 8 * g, 64 * pack_div)
    while ((TILE_N * TILE_K // pack_div > 512 * 1024 or TILE_K // g > 128)
           and TILE_K % 2 == 0 and (TILE_K // 2) % k_align == 0):
        TILE_K //= 2
    n_k_tiles = K // TILE_K

    # per-group symmetric activation quantization (f32 math, exact split)
    xf = x.astype(jnp.float32).reshape(K // g, g)
    amax = jnp.max(jnp.abs(xf), axis=1)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / sx[:, None]), -127, 127).astype(jnp.int8)
    sxr = jnp.broadcast_to(sx[:, None], (K // g, 128))  # lane-replicated

    def blockdiag(xrow, gg):
        """[K'] int8 -> [K'//gg, K'] block-diagonal int8, built by XLA
        (Mosaic cannot do 8-bit elementwise arithmetic in-kernel)."""
        kk = xrow.shape[0]
        ind = (jnp.arange(kk // gg)[:, None] == jnp.arange(kk)[None, :] // gg)
        return jnp.where(ind, xrow[None, :], jnp.int8(0))

    common = dict(
        grid=(1, N // TILE_N, n_k_tiles),
        out_specs=pl.BlockSpec((1, TILE_N), lambda m, i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TILE_N), jnp.float32)],
        interpret=interpret,
    )
    G_t = TILE_K // g
    if qt.packed:
        xb_lo = blockdiag(xq[:, : g // 2].reshape(K // 2), g // 2)
        xb_hi = blockdiag(xq[:, g // 2:].reshape(K // 2), g // 2)
        out = pl.pallas_call(
            partial(_qdot_w8a8_packed_kernel, n_k_tiles=n_k_tiles),
            in_specs=[
                pl.BlockSpec((G_t, TILE_K // 2), lambda m, i, j: (j, j)),
                pl.BlockSpec((G_t, TILE_K // 2), lambda m, i, j: (j, j)),
                pl.BlockSpec((G_t, 128), lambda m, i, j: (j, 0)),
                pl.BlockSpec((TILE_K // 2, TILE_N), lambda m, i, j: (j, i)),
                pl.BlockSpec((G_t, TILE_N), lambda m, i, j: (j, i)),
            ],
            **common,
        )(xb_lo, xb_hi, sxr, qt.values, qt.scales)
    else:
        xb = blockdiag(xq.reshape(K), g)
        out = pl.pallas_call(
            partial(_qdot_w8a8_kernel, n_k_tiles=n_k_tiles),
            in_specs=[
                pl.BlockSpec((G_t, TILE_K), lambda m, i, j: (j, j)),
                pl.BlockSpec((G_t, 128), lambda m, i, j: (j, 0)),
                pl.BlockSpec((TILE_K, TILE_N), lambda m, i, j: (j, i)),
                pl.BlockSpec((G_t, TILE_N), lambda m, i, j: (j, i)),
            ],
            **common,
        )(xb, sxr, qt.values, qt.scales)

    if qt.mins is not None:
        # mins term uses the DEQUANTIZED activations (xhat = xq * sx), the
        # same values the int8 dot saw: the total is then sum xhat * (q*s-m)
        # = sum xhat * w, so the activation-quant error scales with the
        # CENTERED weight — using exact x here would leave a residual
        # eps*(q*s) against the biased (0..15) quants, ~3x larger for Q4_K
        xg = (sx * xq.astype(jnp.float32).sum(axis=1)).reshape(M, K // g)
        out = out - jax.lax.dot_general(
            xg, qt.mins.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if qt.n_out > 0 and qt.n_out != N:
        out = out[:, : qt.n_out]
    return out.astype(x.dtype)


def _use_bf16_dot():
    """bf16 MXU variants for bf16 activations — opt-in while being
    TPU-measured.  MIOTTS_QDOT_BF16=1 -> bf16 dequant+dot; =after ->
    f32 dequant, one bf16 cast at the MXU boundary.  Returns the
    _qdot_pallas bf16_dot value (False/True/"after")."""
    v = os.environ.get("MIOTTS_QDOT_BF16", "")
    if v == "1":
        return True
    if v == "after":
        return "after"
    return False


def _use_pack4_split() -> bool:
    """Split-x packed kernel (_qdot_split_kernel) for packed tensors —
    opt-in while being TPU-measured (MIOTTS_PACK4_SPLIT=1; 0 disables)."""
    return os.environ.get("MIOTTS_PACK4_SPLIT", "") == "1"


def _gemv_m8() -> bool:
    """Run the M=1 decode GEMV through the 8-row M-tile (VERDICT r4 item 5):
    pad the single activation row to the MXU's 8-row sublane tile.  The
    single-row Mosaic lowering computes the f32 dot at effectively-bf16
    precision (~1% of output scale, measured round 4); the >=8-row tile
    gets the exact multi-pass f32 emulation — with this on, M=1 logits are
    bit-identical to the M>=8 (prefill / spec-verify) path, making greedy
    decode path-independent on TPU.  Overrides the w8a8/groupdot GEMV
    variants (those are M=1-only kernels).  MIOTTS_GEMV_M8=1; decode-
    marginal cost measured by ABAB in benchmarks/matrix_r5*."""
    return os.environ.get("MIOTTS_GEMV_M8", "") == "1"


def _gemv_mode() -> str:
    """Decode-GEMV (M=1) kernel selection: 'w8a8' = int8 activations x int8
    weights on the MXU (scale-after-dot), 'groupdot' = scale-after-dot with
    bf16 MXU feed, 'plain' = the standard dequant-then-dot kernel.
    MIOTTS_QDOT_GEMV overrides; MIOTTS_QDOT_GROUPDOT=1 is the round-2
    opt-in alias for 'groupdot'."""
    mode = os.environ.get("MIOTTS_QDOT_GEMV", "")
    if mode in ("groupdot", "plain", "w8a8"):
        return mode
    if os.environ.get("MIOTTS_QDOT_GROUPDOT", "") == "1":
        return "groupdot"
    return "plain"


@partial(jax.jit, static_argnames=("interpret",))
def _qdot_group_pallas(x: jax.Array, qt: QTensor,
                       interpret: bool = False) -> jax.Array:
    """Scale-after-dot GEMV path (see _qdot_group_kernel).  x [1, K]."""
    M, K = x.shape
    if M != 1:
        # the x BlockSpec / out_specs pin the row index to 0: rows 1..M-1
        # would silently be garbage.  qdot() guards this; direct callers
        # (benchmarks/tests) must too.
        raise ValueError(f"_qdot_group_pallas is a GEMV kernel (M=1), got M={M}")
    N = qt.values.shape[1]
    g = qt.group
    pack_div = 2 if qt.packed else 1
    TILE_N = 512 if N % 512 == 0 else (256 if N % 256 == 0 else 128)
    TILE_K = K
    # v tile <= ~512 KB; keep G = TILE_K/g <= 128 so the block-diagonal x
    # rows stay inside the one padded MXU M-block (same MXU cost as M=1);
    # packed value blocks need (TILE_K/2) sublanes aligned to the u8 tiling
    k_align = max(128, 8 * g, 64 * pack_div)
    while ((TILE_N * TILE_K // pack_div > 512 * 1024 or TILE_K // g > 128)
           and TILE_K % 2 == 0 and (TILE_K // 2) % k_align == 0):
        TILE_K //= 2
    n_k_tiles = K // TILE_K

    xb = x.astype(jnp.bfloat16)
    out = pl.pallas_call(
        partial(_qdot_group_kernel, group=g, n_k_tiles=n_k_tiles,
                packed=qt.packed),
        grid=(1, N // TILE_N, n_k_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_K), lambda m, i, j: (0, j)),
            pl.BlockSpec((TILE_K // pack_div, TILE_N),
                         lambda m, i, j: (j, i)),
            pl.BlockSpec((TILE_K // g, TILE_N), lambda m, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((1, TILE_N), lambda m, i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TILE_N), jnp.float32)],
        interpret=interpret,
    )(xb, qt.values, qt.scales)

    if qt.mins is not None:
        xg = x.astype(jnp.float32).reshape(M, K // g, g).sum(axis=2)
        out = out - jax.lax.dot_general(
            xg, qt.mins.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if qt.n_out > 0 and qt.n_out != N:
        out = out[:, : qt.n_out]
    return out.astype(x.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _qdot_pallas_split(x: jax.Array, qt: QTensor,
                       interpret: bool = False) -> jax.Array:
    """Split-x packed matmul (see _qdot_split_kernel).  x [M, K], packed
    QTensor only."""
    if not qt.packed:
        raise ValueError("_qdot_pallas_split requires a packed QTensor")
    M, K = x.shape
    N = qt.values.shape[1]
    g = qt.group

    TILE_N = 512 if N % 512 == 0 else (256 if N % 256 == 0 else 128)
    TILE_K = K
    k_align = max(128, 8 * g, 128)
    while (TILE_N * TILE_K // 2 > 512 * 1024
           and TILE_K % 2 == 0 and (TILE_K // 2) % k_align == 0):
        TILE_K //= 2
    n_k_tiles = K // TILE_K
    TILE_M = M
    while TILE_M > 256 and TILE_M % 2 == 0:
        TILE_M //= 2

    xf = x.astype(jnp.float32)
    # group-local column split OUTSIDE the kernel: lo half / hi half of
    # every quant group, flattened back to [M, K/2] (matches the nibble
    # packing layout: byte row r of group b holds w[b*g + r] in its low
    # nibble and w[b*g + g/2 + r] in its high nibble)
    x3 = xf.reshape(M, K // g, g)
    x_lo = x3[:, :, : g // 2].reshape(M, K // 2)
    x_hi = x3[:, :, g // 2:].reshape(M, K // 2)
    out = pl.pallas_call(
        partial(_qdot_split_kernel, group=g, n_k_tiles=n_k_tiles),
        grid=(M // TILE_M, N // TILE_N, n_k_tiles),
        in_specs=[
            pl.BlockSpec((TILE_M, TILE_K // 2), lambda m, i, j: (m, j)),
            pl.BlockSpec((TILE_M, TILE_K // 2), lambda m, i, j: (m, j)),
            pl.BlockSpec((TILE_K // 2, TILE_N), lambda m, i, j: (j, i)),
            pl.BlockSpec((TILE_K // g, TILE_N), lambda m, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((TILE_M, TILE_N), lambda m, i, j: (m, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_M, TILE_N), jnp.float32)],
        interpret=interpret,
    )(x_lo, x_hi, qt.values, qt.scales)

    if qt.mins is not None:
        xg = xf.reshape(M, K // g, g).sum(axis=2)
        out = out - jax.lax.dot_general(
            xg, qt.mins.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if qt.n_out > 0 and qt.n_out != N:
        out = out[:, : qt.n_out]
    return out.astype(x.dtype)


@partial(jax.jit, static_argnames=("interpret", "bf16_dot"))
def _qdot_pallas(x: jax.Array, qt: QTensor, interpret: bool = False,
                 bf16_dot: bool = False) -> jax.Array:
    """Fused dequant+matmul Pallas kernel.  x [M, K] f32/bf16 -> [M, N].
    Affine formats (mins) add x-group-sums @ mins as a small correction
    matmul outside the kernel.  `bf16_dot`: see _qdot_kernel."""
    M, K = x.shape
    N = qt.values.shape[1]
    g = qt.group
    pack_div = 2 if qt.packed else 1

    TILE_N = 512 if N % 512 == 0 else (256 if N % 256 == 0 else 128)
    TILE_K = K
    # Bound VMEM (value tile <= ~512 KB) while keeping K tiles aligned to
    # the lane width (128, for the x block), the scales block sublane count
    # (TILE_K // g) a multiple of 8, and the packed value block sublane
    # count (TILE_K // 2) a multiple of 32 (int8/uint8 tiling).
    k_align = max(128, 8 * g, 64 * pack_div)
    while (TILE_N * TILE_K // pack_div > 512 * 1024
           and TILE_K % 2 == 0 and (TILE_K // 2) % k_align == 0):
        TILE_K //= 2
    n_k_tiles = K // TILE_K
    # Tile M too: decode is M=1 but batched prefill can be M in the
    # thousands (A slots x prompt bucket), and an untiled [M, K_t] f32 x
    # block + [M, N_t] accumulator blow the ~16 MB VMEM scoped limit.
    TILE_M = M
    while TILE_M > 256 and TILE_M % 2 == 0:
        TILE_M //= 2

    xf = x.astype(jnp.bfloat16 if bf16_dot else jnp.float32)
    out = pl.pallas_call(
        partial(_qdot_kernel, group=g, n_k_tiles=n_k_tiles, packed=qt.packed,
                bf16_dot=bf16_dot),
        grid=(M // TILE_M, N // TILE_N, n_k_tiles),
        in_specs=[
            pl.BlockSpec((TILE_M, TILE_K), lambda m, i, j: (m, j)),
            pl.BlockSpec((TILE_K // pack_div, TILE_N),
                         lambda m, i, j: (j, i)),
            pl.BlockSpec((TILE_K // g, TILE_N), lambda m, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((TILE_M, TILE_N), lambda m, i, j: (m, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_M, TILE_N), jnp.float32)],
        interpret=interpret,
    )(xf, qt.values, qt.scales)

    if qt.mins is not None:
        # correction: sum_k x_k * min_{k//g} = (x group-sums) @ mins
        # (always f32 — the group sums must not accumulate in bf16)
        xg = x.astype(jnp.float32).reshape(M, K // g, g).sum(axis=2)
        out = out - jax.lax.dot_general(
            xg, qt.mins.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if qt.n_out > 0 and qt.n_out != N:
        out = out[:, : qt.n_out]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def qtensor_from_raw(raw: np.ndarray, ggml_type: int, rows: int, cols: int,
                     scale_dtype=jnp.float32, pack4: bool | None = None) -> QTensor:
    """Raw GGUF blocks -> device QTensor, preferring the native C++ repack
    (native/miotts_native.cpp) which writes the transposed planar layout
    directly; falls back to the numpy reference path.

    4-bit formats (Q4_K / Q4_0) default to packed-nibble device storage —
    two quants per byte, halving the dominant HBM read of the decode GEMV
    (disable with MIOTTS_NO_PACK4=1 or pack4=False)."""
    from ..gguf import native as _native
    from ..gguf.reader import GGML_Q4_0, GGML_Q4_K, GGML_Q6_K, GGML_Q8_0
    from ..gguf.quants import to_group_quant

    if pack4 is None:
        # Default ON (round 2): on the current kernel the nibble unpack is
        # cheaper than the halved HBM read saves — 2.6B-Q4_K decode marginal
        # 5.40 -> 4.22 ms/token (benchmarks/matrix_r2/decode_2.6b_pack4.log,
        # bench_qmat 'packed' 3.97 vs 'pallas' 5.11 ms/token kernel time).
        # The repack is bit-exact (lossless nibble re-layout), so quality is
        # unchanged.  Round 1 measured the OLD kernel slower and left it
        # opt-in; MIOTTS_NO_PACK4=1 restores that behavior.
        pack4 = (ggml_type in (GGML_Q4_K, GGML_Q4_0) and cols % 2 == 0
                 and not os.environ.get("MIOTTS_NO_PACK4"))

    def finish(values_t, scales_t, mins_t, group, bias4=False):
        packed = False
        if pack4:
            v = values_t.astype(np.int16)
            if bias4:  # centered [-8, 7] -> biased nibbles + min fold
                v = v + 8
                extra = scales_t * 8.0
                mins_t = extra if mins_t is None else mins_t + extra
            kk, nn = v.shape
            v3 = v.reshape(kk // group, group, nn)
            values_t = (v3[:, : group // 2] | (v3[:, group // 2:] << 4))
            values_t = values_t.reshape(kk // 2, nn).astype(np.uint8)
            packed = True
        n_pad = (-rows) % 128
        if n_pad:
            values_t = np.pad(values_t, ((0, 0), (0, n_pad)))
            scales_t = np.pad(scales_t, ((0, 0), (0, n_pad)))
            if mins_t is not None:
                mins_t = np.pad(mins_t, ((0, 0), (0, n_pad)))
        return QTensor(
            values=jnp.asarray(values_t),
            scales=jnp.asarray(scales_t, scale_dtype),
            mins=None if mins_t is None else jnp.asarray(mins_t, scale_dtype),
            group=group, n_out=rows, packed=packed)

    if _native.available():
        if ggml_type == GGML_Q8_0:
            v, s = _native.repack_q8_0_t(raw, rows, cols)
            return finish(v, s, None, 32)
        if ggml_type == GGML_Q6_K:
            v, s = _native.repack_q6_k_t(raw, rows, cols)
            return finish(v, s, None, 16)
        if ggml_type == GGML_Q4_K:
            v, s, m = _native.repack_q4_k_t(raw, rows, cols)
            return finish(v, s, m, 32)
    gq = to_group_quant(raw, ggml_type, rows, cols)
    qt = QTensor.from_group_quant(gq, scale_dtype)
    if pack4:
        qt = qt.pack4()
    return qt


def concat_qtensors(tensors: list) -> "QTensor | jax.Array":
    """Concatenate weights along the OUTPUT dim (for QKV / gate+up fusion).

    Works for dense [N, K] arrays and for QTensors of equal K; cuts kernel
    launches in the decode hot loop.  Any padding on the inputs is stripped
    first so split points in the fused output are exact.

    Heterogeneous QTensors are harmonized EXACTLY — real llama.cpp Q4_K_M
    files mix formats per layer (Q6_K attn_v/ffn_down next to Q4_K): a
    coarser quant group repeats its scales/mins down to the finest group
    present, tensors without mins get zero mins when a sibling has them,
    and a packed-nibble tensor is unpacked if its siblings aren't packed.
    All three transforms leave the dequantized values bit-identical; the
    cost is only a few % more scale bytes."""
    if all(isinstance(t, jax.Array) for t in tensors):
        return jnp.concatenate(tensors, axis=0)
    if not all(isinstance(t, QTensor) for t in tensors):
        raise ValueError("mixed dense/quantized fusion is not supported")
    if (any(t.packed for t in tensors)
            and not all(t.packed and t.group == tensors[0].group
                        for t in tensors)):
        tensors = [QTensor(values=t._unpacked_values().astype(jnp.int8),
                           scales=t.scales, mins=t.mins, group=t.group,
                           n_out=t.n_out) if t.packed else t
                   for t in tensors]
    g = min(t.group for t in tensors)
    if any(t.group % g for t in tensors):
        raise ValueError(f"incompatible quant groups "
                         f"{[t.group for t in tensors]}")
    has_mins = any(t.mins is not None for t in tensors)
    packed = tensors[0].packed

    def unpad(a, t):
        n = t.n_out if t.n_out > 0 else a.shape[1]
        return a[:, :n]

    def expand(a, t):
        # repeat each group row so a group-`t.group` tensor reads exactly
        # under the fused group size g
        f = t.group // g
        return jnp.repeat(a, f, axis=0) if f > 1 else a

    def mins_of(t):
        if t.mins is not None:
            return expand(unpad(t.mins, t), t)
        k = t.values.shape[0] * (2 if t.packed else 1)
        n = t.n_out if t.n_out > 0 else t.values.shape[1]
        return jnp.zeros((k // g, n), t.scales.dtype)

    values = jnp.concatenate([unpad(t.values, t) for t in tensors], axis=1)
    scales = jnp.concatenate([expand(unpad(t.scales, t), t) for t in tensors],
                             axis=1)
    mins = (jnp.concatenate([mins_of(t) for t in tensors], axis=1)
            if has_mins else None)
    n = values.shape[1]
    n_pad = (-n) % 128
    if n_pad:
        values = jnp.pad(values, ((0, 0), (0, n_pad)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad)))
        if mins is not None:
            mins = jnp.pad(mins, ((0, 0), (0, n_pad)))
    return QTensor(values=values, scales=scales, mins=mins, group=g, n_out=n,
                   packed=packed)


def qdot(x: jax.Array, w) -> jax.Array:
    """x [..., K] @ W^T -> [..., N] for W either a dense [N, K] array (GGUF
    Linear layout) or a QTensor.  The single matmul entry point for all LLM
    linear layers."""
    if isinstance(w, QTensor):
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        # pad small non-multiple-of-8 M (e.g. the speculative verify's
        # M = k+1 rows) up to the sublane width; M=1 stays the GEMV path
        # unless MIOTTS_GEMV_M8 unifies it into the 8-row M-tile (see
        # _gemv_m8: path-independent logits at the cost of a padded tile)
        m_pad = 0
        if x2.shape[0] % 8 and (x2.shape[0] > 1 or _gemv_m8()):
            m_pad = 8 - x2.shape[0] % 8
            x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
        K = x2.shape[1]
        pallas_ok = (_PALLAS_OK and _use_pallas()
                     and K % 128 == 0 and K % w.group == 0
                     and w.values.shape[1] % 128 == 0)
        if pallas_ok:
            # scale-after-dot GEMV variant: M=1, bf16-sourced activations
            # (packed and unpacked values both supported since round 3)
            if _gemv_mode() == "w8a8" and x2.shape[0] == 1:
                y = _qdot_w8a8_pallas(x2, w)
            elif (_gemv_mode() == "groupdot" and x2.shape[0] == 1
                    and x.dtype == jnp.bfloat16):
                y = _qdot_group_pallas(x2, w)
            elif w.packed and _use_pack4_split():
                y = _qdot_pallas_split(x2, w)
            elif x.dtype == jnp.bfloat16 and _use_bf16_dot():
                y = _qdot_pallas(x2, w, bf16_dot=_use_bf16_dot())
            else:
                y = _qdot_pallas(x2, w)
        else:
            y = _qdot_xla(x2, w)
        if m_pad:
            y = y[:-m_pad]
        return y.reshape(*lead, -1)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

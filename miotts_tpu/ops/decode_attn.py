"""Decode-attention Pallas kernel — kept as a MEASURED NEGATIVE RESULT.

The single-token attention of the decode step is pure HBM traffic: every
step reads the whole KV cache once (the weights-vs-KV crossover is around
700-token utterances at 16 concurrent 2.6B streams).  This kernel was
built on the hypothesis that XLA's decode attention wastes bandwidth; the
marginal-cost microbench (benchmarks/bench_attn.py, v5e, B=16 S=1024 2.6B
shapes) REFUTED it:

    xla_bf16   58 us/layer (721 GB/s — HBM speed-of-light)
    xla_int8   41 us/layer (factored scales, models/llm.py:_attend)
    kern_bf16  95 us/layer
    kern_int8 228 us/layer (VPU-bound on the VMEM dequant multiply)

XLA fuses the mask/softmax chain well at these shapes, while the kernel
pays per-grid-cell fixed costs plus VPU element-wise dequant/convert on
every cache byte.  The winning int8 design factors the per-(token, head)
scales OUT of the dots entirely (scores *= k_scale; probs *= v_scale) —
that lives in the XLA path in `models/llm.py:_attend`, which is the
production path.  This kernel stays opt-in (MIOTTS_ATTN_KERNEL=1) so the
comparison can be reproduced, and as the starting point if a future shape
regime (much longer S, more streams) shifts the balance.

Grid layout: one cell per (batch row, S tile) — all KV heads of a tile are
fetched in ONE block so the per-cell DMA is large (H_kv * S_t * D), and the
per-head dots run as an unrolled loop inside the cell.  A (B, H_kv, S_t)
grid was measured 1.5x slower again (40 KB blocks, per-cell fixed costs).

Cache layout is [B, H_kv, S, D] (see `models/llm.py:init_kv_cache`): S on
the sublane axis, D on lanes.  GQA queries ride along as [H_kv, rep, D].

The reference has no analog (llama.cpp's CPU attention,
`test-to-speech.cpp:142,185` via llama_decode); the production TPU design
for this hot loop is the XLA path + int8 KV.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - platform-dependent import
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_NEG = -1e9


def _kernel(fill_ref, qpos_ref, q_ref, k_ref, v_ref, o_ref,
            acc_ref, m_ref, l_ref, *, s_tile, n_s_tiles, scale, quantized,
            h_kv, rep, ks_ref=None, vs_ref=None):
    """Grid (B, S_tiles); blocks q [H_kv, rep, D], k/v [H_kv, S_t, D],
    scales [H_kv, S_t, 1] (when quantized), out [H_kv, rep, D].
    Scratch acc [H_kv, rep, D], m/l [H_kv, rep, 1] (flash running stats)."""
    b = pl.program_id(0)
    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    limit = jnp.minimum(fill_ref[b], qpos_ref[b] + 1)

    @pl.when(s_idx * s_tile < limit)
    def _():
        kpos = s_idx * s_tile + jax.lax.broadcasted_iota(
            jnp.int32, (1, s_tile), 1)
        mask = kpos < limit                                    # [1, S_t]
        for g in range(h_kv):                                  # unrolled
            qv = q_ref[0, g].astype(jnp.float32)               # [rep, D]
            kt = k_ref[0, g].astype(jnp.float32)               # [S_t, D]
            if quantized:
                # dequant in VMEM: HBM read stays 1 B/elem
                kt = kt * ks_ref[0, g].astype(jnp.float32)     # ks [S_t, 1]
            scores = jax.lax.dot_general(
                qv, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale    # [rep, S_t]
            scores = jnp.where(mask, scores, _NEG)

            m_prev = m_ref[g]                                  # [rep, 1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)                        # [rep, S_t]
            alpha = jnp.exp(m_prev - m_new)                    # [rep, 1]
            l_ref[g] = l_ref[g] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vt = v_ref[0, g].astype(jnp.float32)               # [S_t, D]
            if quantized:
                vt = vt * vs_ref[0, g].astype(jnp.float32)
            acc_ref[g] = acc_ref[g] * alpha + jax.lax.dot_general(
                p, vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[g] = m_new

    @pl.when(s_idx == n_s_tiles - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)
                    ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q, k_cache, v_cache, fill, q_pos,
                     k_scale=None, v_scale=None, interpret: bool = False):
    """Single-position attention against the cache.

    q: [B, H, D]; k/v_cache: [B, H_kv, S, D] (bf16/f32 or int8);
    fill/q_pos: [B] i32; k/v_scale: [B, H_kv, S] f32 when the cache is int8.
    Returns [B, H, D] f32.  Key s of head g is valid iff
    s <= q_pos[b] and s < fill[b] (matching `_attend`).
    """
    B, H, D = q.shape
    _, H_kv, S, _ = k_cache.shape
    rep = H // H_kv
    quantized = k_scale is not None
    if interpret:
        # CPU interpret mode can't execute bf16 dots (DotThunk); upcast for
        # the parity tests.  The TPU path keeps native dtypes.
        q = q.astype(jnp.float32)
        if k_cache.dtype != jnp.int8:
            k_cache = k_cache.astype(jnp.float32)
            v_cache = v_cache.astype(jnp.float32)
    s_tile = S if S <= 512 else 512
    assert S % s_tile == 0
    n_s = S // s_tile
    qg = q.reshape(B, H_kv, rep, D)

    grid = (B, n_s)
    in_specs = [
        pl.BlockSpec((1, H_kv, rep, D), lambda b, s, *_: (b, 0, 0, 0)),
        pl.BlockSpec((1, H_kv, s_tile, D), lambda b, s, *_: (b, 0, s, 0)),
        pl.BlockSpec((1, H_kv, s_tile, D), lambda b, s, *_: (b, 0, s, 0)),
    ]
    args = [qg, k_cache, v_cache]
    kern = partial(_kernel, s_tile=s_tile, n_s_tiles=n_s,
                   scale=1.0 / np.sqrt(D), quantized=quantized,
                   h_kv=H_kv, rep=rep)
    if quantized:
        # scales ride as [B, H_kv, S, 1] so the (S_t, 1) block satisfies
        # the TPU (8, 128)-divisible-or-full tiling rule
        in_specs += [
            pl.BlockSpec((1, H_kv, s_tile, 1), lambda b, s, *_: (b, 0, s, 0)),
            pl.BlockSpec((1, H_kv, s_tile, 1), lambda b, s, *_: (b, 0, s, 0)),
        ]
        args += [k_scale[..., None], v_scale[..., None]]

        def kern(fill_ref, qpos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                 o_ref, acc_ref, m_ref, l_ref):
            return _kernel(fill_ref, qpos_ref, q_ref, k_ref, v_ref, o_ref,
                           acc_ref, m_ref, l_ref, s_tile=s_tile,
                           n_s_tiles=n_s, scale=1.0 / np.sqrt(D),
                           quantized=True, h_kv=H_kv, rep=rep,
                           ks_ref=ks_ref, vs_ref=vs_ref)

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, H_kv, rep, D),
                                   lambda b, s, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H_kv, rep, D), jnp.float32),
                pltpu.VMEM((H_kv, rep, 1), jnp.float32),
                pltpu.VMEM((H_kv, rep, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H_kv, rep, D), jnp.float32),
        interpret=interpret,
    )(fill.astype(jnp.int32), q_pos.astype(jnp.int32), *args)
    return out.reshape(B, H, D)


def _batched_kernel(fill_ref, qpos_ref, q_ref, k_ref, v_ref, o_ref,
                    acc_ref, m_ref, l_ref, *, s_tile, n_s_tiles, b_tile,
                    scale, h_kv, rep, int8_mxu,
                    qs_ref=None, ks_ref=None, vs_ref=None):
    """Batch-tiled decode attention (round 5, VERDICT r4 item 2).

    The round-1 kernel's grid is one batch row per cell; at serving B=128
    that is 128 cells of per-cell fixed cost, which is where it lost to
    XLA.  Here a cell covers B_T rows: grid (B // B_T, S_tiles), blocks
    q [B_T, H_kv, rep, D], k/v [B_T, H_kv, S_t, D], scales
    [B_T, H_kv, 1, S_t].  Masked flash updates replace pl.when so each
    row's own `limit` gates contributions without per-row predication.

    int8_mxu mode: the cache bytes go from HBM to the MXU as INTEGERS
    (the w8a8 lesson, ops/qmat.py: per-element int->float conversion on
    the VPU was the 228 us/layer pole of the round-1 int8 kernel).  The
    query is pre-quantized per row OUTSIDE (int8 x int8 -> int32 scores
    dot); for the PV dot the probabilities absorb the v scales, then
    quantize to int8 IN-kernel via the f32->i32->i8 two-step (Mosaic has
    no 8-bit arithmetic but converts through i32 fine — the packed-w8a8
    precedent).  Accuracy: ~1% of row scale from the 8-bit probability
    quantization — a measurement variant, not a parity path.
    """
    nb = pl.program_id(0)
    s_idx = pl.program_id(1)
    if isinstance(o_ref, (tuple, list)):
        o_ref, om_ref, ol_ref = o_ref       # stats mode (flash merge)
    else:
        om_ref = ol_ref = None

    @pl.when(s_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    kpos = s_idx * s_tile + jax.lax.broadcasted_iota(
        jnp.int32, (1, s_tile), 1)
    for i in range(b_tile):
        b = nb * b_tile + i
        limit = jnp.minimum(fill_ref[b], qpos_ref[b] + 1)
        mask = kpos < limit                                     # [1, S_t]
        for g in range(h_kv):
            if int8_mxu:
                d = jax.lax.dot_general(
                    q_ref[i, g], k_ref[i, g], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)           # [rep, S_t]
                scores = (d.astype(jnp.float32)
                          * (qs_ref[i, g].astype(jnp.float32) * scale)
                          * ks_ref[i, g].astype(jnp.float32))
            else:
                qv = q_ref[i, g]                                # [rep, D]
                scores = jax.lax.dot_general(
                    qv, k_ref[i, g], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            scores = jnp.where(mask, scores, _NEG)

            m_prev = m_ref[i, g]                                # [rep, 1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=-1, keepdims=True))
            # masked-out columns MUST be zeroed explicitly: on an all-
            # masked tile m_new stays _NEG and exp(scores - m_new) = 1
            p = jnp.where(mask, jnp.exp(scores - m_new), 0.0)   # [rep, S_t]
            alpha = jnp.exp(m_prev - m_new)                     # [rep, 1]
            l_ref[i, g] = l_ref[i, g] * alpha \
                + jnp.sum(p, axis=-1, keepdims=True)
            if int8_mxu:
                ps = p * vs_ref[i, g].astype(jnp.float32)       # [rep, S_t]
                psc = jnp.maximum(jnp.max(ps, axis=-1, keepdims=True),
                                  1e-20) / 127.0                # [rep, 1]
                p_i8 = (ps / psc + 0.5).astype(jnp.int32).astype(jnp.int8)
                d2 = jax.lax.dot_general(
                    p_i8, v_ref[i, g], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)           # [rep, D]
                pv = d2.astype(jnp.float32) * psc
            else:
                pv = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[i, g],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[i, g] = acc_ref[i, g] * alpha + pv
            m_ref[i, g] = m_new

    @pl.when(s_idx == n_s_tiles - 1)
    def _():
        if om_ref is None:
            o_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)
                        ).astype(o_ref.dtype)
        else:
            # flash-merge mode: the caller folds more score sources
            # (chunk buffer, current token) into the same softmax
            o_ref[:] = acc_ref[:]
            om_ref[:] = m_ref[:]
            ol_ref[:] = l_ref[:]


@partial(jax.jit, static_argnames=("b_tile", "interpret", "return_stats"))
def decode_attention_batched(q, k_cache, v_cache, fill, q_pos,
                             k_scale=None, v_scale=None, b_tile: int = 8,
                             interpret: bool = False,
                             return_stats: bool = False):
    """Batch-tiled single-position attention (see _batched_kernel).

    q [B, H, D] (f32/bf16); k/v_cache [B, H_kv, S, D] bf16/f32 or int8
    (int8 REQUIRES k_scale/v_scale [B, H_kv, S] and engages the int8-MXU
    path); fill/q_pos [B] i32.  Returns [B, H, D] f32.  B % b_tile == 0.
    """
    B, H, D = q.shape
    _, H_kv, S, _ = k_cache.shape
    rep = H // H_kv
    assert B % b_tile == 0, (B, b_tile)
    int8_mxu = k_cache.dtype == jnp.int8
    # Bound VMEM: the k+v blocks are b_tile*H_kv*s_tile*D*bytes each and
    # Pallas double-buffers them across grid cells; B=128 bf16 at
    # s_tile=256 measured 16.38M vs the 16M scoped limit (matrix_r5
    # attn_128 log).  Keep the double-buffered k+v footprint under ~8 MB
    # by halving s_tile (the flash accumulation is tile-count-agnostic).
    bytes_el = 1 if int8_mxu else (2 if k_cache.dtype == jnp.bfloat16 else 4)
    s_tile = S if S <= 512 else 512
    while (s_tile > 128
           and 2 * 2 * b_tile * H_kv * s_tile * D * bytes_el > 8 * 2 ** 20):
        s_tile //= 2
    assert S % s_tile == 0
    n_s = S // s_tile
    n_b = B // b_tile

    if int8_mxu:
        # pre-quantize the query per (b, h) row outside the kernel (tiny)
        qf = q.astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                         1e-20) / 127.0                     # [B, H, 1]
        qq = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
        qg = qq.reshape(B, H_kv, rep, D)
        qsg = qs.reshape(B, H_kv, rep, 1)
    else:
        cdt = jnp.float32 if interpret else jnp.bfloat16
        qg = q.astype(cdt).reshape(B, H_kv, rep, D)
        if interpret and k_cache.dtype != jnp.float32:
            k_cache = k_cache.astype(jnp.float32)
            v_cache = v_cache.astype(jnp.float32)

    grid = (n_b, n_s)
    in_specs = [
        pl.BlockSpec((b_tile, H_kv, rep, D), lambda nb, s, *_: (nb, 0, 0, 0)),
        pl.BlockSpec((b_tile, H_kv, s_tile, D), lambda nb, s, *_: (nb, 0, s, 0)),
        pl.BlockSpec((b_tile, H_kv, s_tile, D), lambda nb, s, *_: (nb, 0, s, 0)),
    ]
    args = [qg, k_cache, v_cache]
    n_out = 3 if return_stats else 1
    body = partial(_batched_kernel, s_tile=s_tile, n_s_tiles=n_s,
                   b_tile=b_tile, scale=1.0 / np.sqrt(D), h_kv=H_kv,
                   rep=rep, int8_mxu=int8_mxu)

    def kern(fill_ref, qpos_ref, q_ref, k_ref, v_ref, *rest):
        o = rest[:n_out] if return_stats else rest[0]
        return body(fill_ref, qpos_ref, q_ref, k_ref, v_ref, o,
                    *rest[n_out:])

    if int8_mxu:
        # scales ride as [B, H_kv, 1, S] so a [1, S_t] in-kernel slice
        # broadcasts across score rows without a transpose
        in_specs.insert(0, pl.BlockSpec((b_tile, H_kv, rep, 1),
                                        lambda nb, s, *_: (nb, 0, 0, 0)))
        in_specs += [
            pl.BlockSpec((b_tile, H_kv, 1, s_tile),
                         lambda nb, s, *_: (nb, 0, 0, s)),
            pl.BlockSpec((b_tile, H_kv, 1, s_tile),
                         lambda nb, s, *_: (nb, 0, 0, s)),
        ]
        args = [qsg, qg, k_cache, v_cache,
                k_scale[:, :, None, :], v_scale[:, :, None, :]]

        def kern(fill_ref, qpos_ref, qs_ref, q_ref, k_ref, v_ref, ks_ref,
                 vs_ref, *rest):
            o = rest[:n_out] if return_stats else rest[0]
            return body(fill_ref, qpos_ref, q_ref, k_ref, v_ref, o,
                        *rest[n_out:], qs_ref=qs_ref, ks_ref=ks_ref,
                        vs_ref=vs_ref)

    out_specs = pl.BlockSpec((b_tile, H_kv, rep, D),
                             lambda nb, s, *_: (nb, 0, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, H_kv, rep, D), jnp.float32)
    if return_stats:
        stat_spec = pl.BlockSpec((b_tile, H_kv, rep, 1),
                                 lambda nb, s, *_: (nb, 0, 0, 0))
        stat_shape = jax.ShapeDtypeStruct((B, H_kv, rep, 1), jnp.float32)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape, stat_shape, stat_shape)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((b_tile, H_kv, rep, D), jnp.float32),
                pltpu.VMEM((b_tile, H_kv, rep, 1), jnp.float32),
                pltpu.VMEM((b_tile, H_kv, rep, 1), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(fill.astype(jnp.int32), q_pos.astype(jnp.int32), *args)
    if return_stats:
        acc, m, l = out
        return (acc.reshape(B, H, D), m.reshape(B, H), l.reshape(B, H))
    return out.reshape(B, H, D)


def _dma_floor(q, k_cache, v_cache):
    """Microbenchmark helper: fetch the same k/v blocks as the real kernel
    but do (almost) no math — measures the per-cell fixed cost + DMA floor
    of the grid layout.  Not used in serving."""
    B, H, D = q.shape
    _, H_kv, S, _ = k_cache.shape
    s_tile = S if S <= 512 else 512
    n_s = S // s_tile

    def kern(k_ref, v_ref, o_ref, acc_ref):
        s_idx = pl.program_id(1)

        @pl.when(s_idx == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] += (k_ref[0, :, :8, :].astype(jnp.float32)
                       + v_ref[0, :, :8, :].astype(jnp.float32))

        @pl.when(s_idx == n_s - 1)
        def _():
            o_ref[0] = acc_ref[:]

    return pl.pallas_call(
        kern,
        grid=(B, n_s),
        in_specs=[
            pl.BlockSpec((1, H_kv, s_tile, D), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((1, H_kv, s_tile, D), lambda b, s: (b, 0, s, 0)),
        ],
        out_specs=pl.BlockSpec((1, H_kv, 8, D), lambda b, s: (b, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((H_kv, 8, D), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((B, H_kv, 8, D), jnp.float32),
    )(k_cache, v_cache)


def decode_attention_batched_supported(batch: int, s_len: int) -> bool:
    """Static gate for the round-5 batch-tiled kernel in `_attend`'s
    serve path (S_q == 1, chunk buffer / current column handled by the
    flash merge in models/llm.py:_attend_bkernel).  Opt-in while being
    TPU-measured: MIOTTS_ATTN_BKERNEL=1."""
    import os
    if not os.environ.get("MIOTTS_ATTN_BKERNEL") or not _PALLAS_OK:
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    if backend not in ("tpu", "axon"):
        return False
    b_tile = int(os.environ.get("MIOTTS_ATTN_BTILE", "8"))
    s_tile = s_len if s_len <= 512 else 512
    return batch % b_tile == 0 and s_len % s_tile == 0


def decode_attention_supported(q_shape, s_len: int) -> bool:
    """Static gate used by `_attend`.  OFF by default: the XLA path
    measured faster (see module docstring); MIOTTS_ATTN_KERNEL=1 re-enables
    the kernel for comparison runs."""
    import os
    if not os.environ.get("MIOTTS_ATTN_KERNEL") or not _PALLAS_OK:
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    if backend not in ("tpu", "axon"):
        return False
    s_tile = s_len if s_len <= 512 else 512
    return s_len % s_tile == 0

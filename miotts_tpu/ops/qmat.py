"""Quantized weight tensors on device + fused dequant matmul.

TPU-native replacement for ggml's quantized matmul (SURVEY.md §2.2): GGUF
block formats are repacked once at load into the planar GroupQuant layout
(gguf/quants.py) and live in HBM as int8 values + per-group scales.  The
matmul dequantizes inside the kernel, so weight bytes read from HBM stay at
~1 byte/element — the decode GEMV is HBM-bandwidth-bound, which makes this
the difference between Q4 being 4x faster than f32 or not.

Two execution paths:
  * XLA path (`_qdot_xla`): dequant to bf16/f32 then dot.  XLA fuses the
    dequant into the matmul prologue; used on CPU (tests) and as fallback.
  * Pallas path (`_qdot_pallas`): explicit VMEM-tiled kernel, dequant fused
    ahead of the MXU dot, guaranteed no materialized f32 weight copy.

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
    """Group-affine quantized matrix [out, in], contraction over `in`.

    dequant: w[o, i] = values[o, i] * scales[o, i//group] - mins[o, i//group]
    """
    values: jax.Array            # int8  [N, K]
    scales: jax.Array            # f32   [N, K // group]
    mins: jax.Array | None       # f32   [N, K // group] or None
    group: int

    @property
    def shape(self):
        return self.values.shape

    def tree_flatten(self):
        leaves = [self.values, self.scales]
        if self.mins is not None:
            leaves.append(self.mins)
        return leaves, (self.group, self.mins is not None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        group, has_mins = aux
        values, scales = leaves[0], leaves[1]
        mins = leaves[2] if has_mins else None
        return cls(values=values, scales=scales, mins=mins, group=group)

    @classmethod
    def from_group_quant(cls, gq: GroupQuant, scale_dtype=jnp.float32) -> "QTensor":
        return cls(
            values=jnp.asarray(gq.values),
            scales=jnp.asarray(gq.scales, scale_dtype),
            mins=None if gq.mins is None else jnp.asarray(gq.mins, scale_dtype),
            group=gq.group,
        )

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        n, k = self.values.shape
        g = self.group
        s = jnp.repeat(self.scales, g, axis=1)
        w = self.values.astype(dtype) * s.astype(dtype)
        if self.mins is not None:
            w = w - jnp.repeat(self.mins, g, axis=1).astype(dtype)
        return w


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
    """x [..., K] @ W^T -> [..., N].  Dequant in x.dtype; XLA fuses."""
    w = qt.dequant(jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas path
# ---------------------------------------------------------------------------

def _qdot_kernel(x_ref, v_ref, s_ref, o_ref, acc_ref, *, group, n_k_tiles, has_min):
    """Grid (n_tiles, k_tiles).  Blocks:
    x [M, K_t], v int8 [N_t, K_t], s [N_t, K_t//g] (mins folded as extra rows
    when present — see _qdot_pallas), out [M, N_t], acc f32 scratch."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    v = v_ref[:].astype(jnp.float32)
    s = s_ref[:]
    n_t, k_t = v.shape
    # group-affine dequant: broadcast each scale over its g consecutive cols
    w = (v.reshape(n_t, k_t // group, group) * s[:, :, None]).reshape(n_t, k_t)
    x = x_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@partial(jax.jit, static_argnames=("interpret",))
def _qdot_pallas(x: jax.Array, qt: QTensor, interpret: bool = False) -> jax.Array:
    """Fused dequant+matmul Pallas kernel.  x [M, K] f32/bf16, returns
    [M, N] in x.dtype.  Affine formats (mins) are decomposed as
    x @ (v*s)^T - (group-sums of x) @ mins^T, the second term a tiny matmul.
    """
    M, K = x.shape
    N, _ = qt.values.shape
    g = qt.group

    TILE_N = 256 if N % 256 == 0 else 128
    if N % TILE_N != 0:
        TILE_N = N  # small / odd layouts: single tile
    TILE_K = K
    # Bound VMEM: keep value tile <= ~2 MB
    while TILE_N * TILE_K > 2 * 1024 * 1024 and TILE_K % (2 * g) == 0:
        TILE_K //= 2
    n_k_tiles = K // TILE_K

    xf = x.astype(jnp.float32)
    out = pl.pallas_call(
        partial(_qdot_kernel, group=g, n_k_tiles=n_k_tiles, has_min=False),
        grid=(N // TILE_N, n_k_tiles),
        in_specs=[
            pl.BlockSpec((M, TILE_K), lambda i, j: (0, j)),
            pl.BlockSpec((TILE_N, TILE_K), lambda i, j: (i, j)),
            pl.BlockSpec((TILE_N, TILE_K // g), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((M, TILE_N), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, TILE_N), jnp.float32)],
        interpret=interpret,
    )(xf, qt.values, qt.scales)

    if qt.mins is not None:
        # correction term: sum_k x_k * min_{k//g} = (x group-sums) @ mins^T
        xg = xf.reshape(M, K // g, g).sum(axis=2)
        out = out - jax.lax.dot_general(
            xg, qt.mins, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def qdot(x: jax.Array, w) -> jax.Array:
    """x [..., K] @ W^T -> [..., N] for W either a plain array [N, K] or a
    QTensor.  The single matmul entry point for all LLM linear layers."""
    if isinstance(w, QTensor):
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if _use_pallas() and _PALLAS_OK:
            y = _qdot_pallas(x2, w)
        else:
            y = _qdot_xla(x2, w)
        return y.reshape(*lead, -1)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

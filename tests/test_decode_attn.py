"""Parity tests for the fused decode-attention kernel (ops/decode_attn.py)
against the XLA `_attend` path, run in Pallas interpret mode on CPU.

Covers both bf16 and int8-quantized caches, non-128 head dims (the 2.6B
config uses D=80), non-power-of-two GQA ratios (0.1B uses rep=3), multiple
S tiles, and ragged per-slot fills (continuous batching)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miotts_tpu.models.llm import _attend, _kv_quantize
from miotts_tpu.ops.decode_attn import decode_attention


def _ref(q, k, v, fill, q_pos, ks=None, vs=None):
    """XLA reference: q [B, H, D] -> [B, H, D] via _attend."""
    B, H, D = q.shape
    out = _attend(q[:, None], k, v, fill, q_pos[:, None], ks, vs)
    return np.asarray(out.astype(jnp.float32)).reshape(B, H, D)


def _mk(B, H, H_kv, S, D, seed=0, quantized=False, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, D)), dtype)
    k = rng.standard_normal((B, H_kv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H_kv, S, D)).astype(np.float32)
    if quantized:
        # quantize over D exactly like the cache write path
        kq, ks = _kv_quantize(jnp.asarray(k))
        vq, vs = _kv_quantize(jnp.asarray(v))
        return q, kq, vq, ks, vs
    return q, jnp.asarray(k, dtype), jnp.asarray(v, dtype), None, None


@pytest.mark.parametrize("B,H,H_kv,D,S", [
    (1, 12, 4, 64, 128),     # 0.1B shape, rep=3
    (2, 8, 2, 80, 512),      # 2.6B-style head_dim 80, two S tiles
    (4, 4, 4, 64, 256),      # MHA (rep=1)
])
def test_kernel_matches_xla(B, H, H_kv, D, S):
    q, k, v, _, _ = _mk(B, H, H_kv, S, D, seed=B + D)
    rng = np.random.default_rng(1)
    fill = jnp.asarray(rng.integers(1, S + 1, size=B), jnp.int32)
    q_pos = fill - 1
    got = decode_attention(q, k, v, fill, q_pos, interpret=True)
    want = _ref(q, k, v, fill, q_pos)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_kernel_int8_kv():
    B, H, H_kv, D, S = 3, 8, 4, 80, 512
    q, kq, vq, ks, vs = _mk(B, H, H_kv, S, D, seed=7, quantized=True)
    fill = jnp.asarray([5, S, 300], jnp.int32)
    q_pos = fill - 1
    got = decode_attention(q, kq, vq, fill, q_pos, ks, vs, interpret=True)
    want = _ref(q, kq, vq, fill, q_pos, ks, vs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_kernel_qpos_below_fill():
    """q_pos < fill - 1 (holdback re-decode shapes) must mask by q_pos."""
    B, H, H_kv, D, S = 2, 4, 2, 64, 256
    q, k, v, _, _ = _mk(B, H, H_kv, S, D, seed=3)
    fill = jnp.asarray([200, 256], jnp.int32)
    q_pos = jnp.asarray([100, 0], jnp.int32)
    got = decode_attention(q, k, v, fill, q_pos, interpret=True)
    want = _ref(q, k, v, fill, q_pos)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_kernel_bf16_cache():
    """bf16 inputs through the kernel vs the f32 XLA reference on the same
    (bf16-rounded) values.  The CPU backend can't run bf16 dots at all, so
    the reference runs in f32 — the kernel accumulates in f32 anyway."""
    B, H, H_kv, D, S = 2, 8, 4, 64, 256
    q, k, v, _, _ = _mk(B, H, H_kv, S, D, seed=9, dtype=jnp.bfloat16)
    fill = jnp.asarray([77, 201], jnp.int32)
    q_pos = fill - 1
    got = decode_attention(q, k, v, fill, q_pos, interpret=True)
    want = _ref(q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), fill, q_pos)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)

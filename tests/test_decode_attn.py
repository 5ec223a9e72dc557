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
from miotts_tpu.ops.decode_attn import decode_attention, decode_attention_batched


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


@pytest.mark.parametrize("B,H,H_kv,D,S,bt", [
    (8, 8, 2, 80, 512, 4),    # 2.6B-style head_dim, two S tiles
    (16, 12, 4, 64, 256, 8),  # rep=3, serving-ish batch
    (4, 4, 4, 64, 128, 4),    # MHA
])
def test_batched_kernel_matches_xla(B, H, H_kv, D, S, bt):
    """Batch-tiled kernel (round 5): f32/bf16 cache path vs _attend, with
    ragged per-row fills crossing tile boundaries."""
    q, k, v, _, _ = _mk(B, H, H_kv, S, D, seed=B + D)
    rng = np.random.default_rng(2)
    fill = jnp.asarray(rng.integers(1, S + 1, size=B), jnp.int32)
    q_pos = fill - 1
    got = decode_attention_batched(q, k, v, fill, q_pos, b_tile=bt,
                                   interpret=True)
    want = _ref(q, k, v, fill, q_pos)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_batched_kernel_int8_mxu():
    """int8-MXU path: integer scores dot + quantized-probability PV dot.
    Accuracy bound is the documented ~1%-of-row-scale (8-bit probability
    quantization) — a measurement variant, not a parity path."""
    B, H, H_kv, D, S = 8, 8, 4, 80, 512
    q, kq, vq, ks, vs = _mk(B, H, H_kv, S, D, seed=7, quantized=True)
    fill = jnp.asarray([5, S, 300, 128, 1, 77, 256, 512], jnp.int32)
    q_pos = fill - 1
    got = decode_attention_batched(q, kq, vq, fill, q_pos, ks, vs,
                                   b_tile=4, interpret=True)
    want = _ref(q, kq, vq, fill, q_pos, ks, vs)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(got), want,
                               atol=0.03 * scale, rtol=0.03)


def test_batched_kernel_qpos_below_fill():
    B, H, H_kv, D, S = 4, 4, 2, 64, 256
    q, k, v, _, _ = _mk(B, H, H_kv, S, D, seed=3)
    fill = jnp.asarray([200, 256, 64, 8], jnp.int32)
    q_pos = jnp.asarray([100, 0, 63, 3], jnp.int32)
    got = decode_attention_batched(q, k, v, fill, q_pos, b_tile=4,
                                   interpret=True)
    want = _ref(q, k, v, fill, q_pos)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_attend_nocat_matches_concat(monkeypatch):
    """MIOTTS_ATTN_NOCAT (round 5): the flash-style merged softmax over
    cache + chunk buffer + current column must match the concatenate-
    softmax path to float tolerance, for both bf16-class and int8 caches."""
    B, H, H_kv, D, S, W = 4, 8, 4, 80, 256, 20
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H_kv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H_kv, S, D)), jnp.float32)
    k_buf = jnp.asarray(rng.standard_normal((B, H_kv, W, D)), jnp.float32)
    v_buf = jnp.asarray(rng.standard_normal((B, H_kv, W, D)), jnp.float32)
    buf_valid = jnp.asarray(rng.integers(0, 2, (B, W)), bool).at[:, 0].set(True)
    k_cur = jnp.asarray(rng.standard_normal((B, 1, H_kv, D)), jnp.float32)
    v_cur = jnp.asarray(rng.standard_normal((B, 1, H_kv, D)), jnp.float32)
    fill = jnp.asarray([S, 100, 7, 200], jnp.int32)
    q_pos = fill[:, None]          # [B, S_q=1], current position
    kq, ks = _kv_quantize(k)
    vq, vs = _kv_quantize(v)

    for kk, vv, kss, vss, tol in ((k, v, None, None, 1e-6),
                                  (kq, vq, ks, vs, 1e-6)):
        monkeypatch.delenv("MIOTTS_ATTN_NOCAT", raising=False)
        want = _attend(q, kk, vv, fill, q_pos, kss, vss, k_cur=k_cur,
                       v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
                       buf_valid=buf_valid)
        monkeypatch.setenv("MIOTTS_ATTN_NOCAT", "1")
        got = _attend(q, kk, vv, fill, q_pos, kss, vss, k_cur=k_cur,
                      v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
                      buf_valid=buf_valid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=tol, atol=tol)


def test_attend_bkernel_serve_path_parity():
    """_attend_bkernel (batch-tiled kernel + flash merge of chunk-buffer and
    current-token columns) vs the XLA _attend serve path."""
    from miotts_tpu.models.llm import _attend_bkernel
    B, H, H_kv, D, S, W = 8, 8, 4, 80, 256, 12
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H_kv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H_kv, S, D)), jnp.float32)
    k_buf = jnp.asarray(rng.standard_normal((B, H_kv, W, D)), jnp.float32)
    v_buf = jnp.asarray(rng.standard_normal((B, H_kv, W, D)), jnp.float32)
    buf_valid = jnp.asarray(rng.integers(0, 2, (B, W)), bool)
    k_cur = jnp.asarray(rng.standard_normal((B, 1, H_kv, D)), jnp.float32)
    v_cur = jnp.asarray(rng.standard_normal((B, 1, H_kv, D)), jnp.float32)
    fill = jnp.asarray([S, 100, 7, 200, 0, 33, 256, 129], jnp.int32)
    q_pos = fill[:, None]
    kq, ks = _kv_quantize(k)
    vq, vs = _kv_quantize(v)

    for kk, vv, kss, vss, tol in ((k, v, None, None, 1e-5),
                                  (kq, vq, ks, vs, 0.04)):
        want = _attend(q, kk, vv, fill, q_pos, kss, vss, k_cur=k_cur,
                       v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
                       buf_valid=buf_valid)
        got = _attend_bkernel(q, kk, vv, fill, q_pos, kss, vss, k_cur=k_cur,
                              v_cur=v_cur, k_buf=k_buf, v_buf=v_buf,
                              buf_valid=buf_valid, interpret=True)
        scale = np.abs(np.asarray(want)).max()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=tol * scale, rtol=tol)
    # cur-only (plain deferred-write decode, no chunk buffer)
    want = _attend(q, k, v, fill, q_pos, k_cur=k_cur, v_cur=v_cur)
    got = _attend_bkernel(q, k, v, fill, q_pos, k_cur=k_cur, v_cur=v_cur,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


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

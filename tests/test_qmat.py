"""Quantized matmul tests: QTensor round-trip, qdot vs dense, Pallas
interpret-mode kernel parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miotts_tpu.gguf import GGML_Q4_K, GGML_Q6_K, GGML_Q8_0, to_group_quant
from miotts_tpu.gguf.quants import dequantize, quantize
from miotts_tpu.ops.qmat import QTensor, _qdot_pallas, _qdot_xla, qdot


def _make_qt(gtype, n, k, rng):
    w = rng.standard_normal((n, k)).astype(np.float32)
    raw = np.frombuffer(quantize(w, gtype), dtype=np.uint8)
    gq = to_group_quant(raw, gtype, n, k)
    ref = dequantize(raw, gtype, n * k).reshape(n, k)
    return QTensor.from_group_quant(gq), ref


@pytest.mark.parametrize("gtype", [GGML_Q8_0, GGML_Q4_K, GGML_Q6_K])
def test_qtensor_dequant_matches_reference(gtype, rng):
    qt, ref = _make_qt(gtype, 8, 512, rng)
    np.testing.assert_allclose(np.asarray(qt.dequant()), ref, atol=1e-6)


@pytest.mark.parametrize("gtype", [GGML_Q8_0, GGML_Q4_K, GGML_Q6_K])
def test_qdot_xla_matches_dense(gtype, rng):
    qt, ref = _make_qt(gtype, 16, 512, rng)
    x = jnp.asarray(rng.standard_normal((3, 512)), jnp.float32)
    got = np.asarray(qdot(x, qt))
    want = np.asarray(x) @ ref.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qdot_small_odd_m_padded(rng):
    """M in (1, 8) not a multiple of the sublane width (the speculative
    verify's M = k+1 rows) is padded to 8 inside qdot and unpadded after;
    results must match dense exactly at every such M."""
    qt, ref = _make_qt(GGML_Q4_K, 256, 512, rng)
    for m in (2, 5, 7, 9):
        x = jnp.asarray(rng.standard_normal((m, 512)), jnp.float32)
        got = np.asarray(qdot(x, qt))
        want = np.asarray(x) @ ref.T
        assert got.shape == (m, 256)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qdot_batched_leading_dims(rng):
    qt, ref = _make_qt(GGML_Q8_0, 16, 256, rng)
    x = jnp.asarray(rng.standard_normal((2, 3, 256)), jnp.float32)
    got = np.asarray(qdot(x, qt))
    want = np.asarray(x) @ ref.T
    assert got.shape == (2, 3, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qtensor_pytree_roundtrip(rng):
    qt, _ = _make_qt(GGML_Q4_K, 8, 256, rng)
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.group == qt.group
    np.testing.assert_array_equal(np.asarray(qt2.values), np.asarray(qt.values))


@pytest.mark.parametrize("gtype", [GGML_Q8_0, GGML_Q6_K, GGML_Q4_K])
def test_qdot_pallas_interpret_matches_xla(gtype, rng):
    """Pallas kernel (interpret mode on CPU) must equal the XLA path."""
    qt, _ = _make_qt(gtype, 256, 512, rng)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    want = np.asarray(_qdot_xla(x, qt))
    got = np.asarray(_qdot_pallas(x, qt, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("gtype", [GGML_Q8_0, GGML_Q6_K, GGML_Q4_K])
def test_qdot_groupdot_interpret_matches_xla(gtype, rng):
    """Scale-after-dot GEMV kernel == XLA path at bf16-activation precision
    (the variant contracts each quant group separately and scales the
    per-group partial sums; bf16 represents int8 values and bf16-sourced
    activations exactly, so the only tolerance is the f32-vs-exact
    accumulation order)."""
    from miotts_tpu.ops.qmat import _qdot_group_pallas
    qt, ref = _make_qt(gtype, 256, 512, rng)
    x = jnp.asarray(rng.standard_normal((1, 512)), jnp.bfloat16)
    want = np.asarray(x.astype(jnp.float32)) @ ref.T
    got = np.asarray(_qdot_group_pallas(x, qt, interpret=True)
                     .astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_qdot_groupdot_multi_ktile(rng):
    """K large enough to force several k-tiles through the group kernel."""
    from miotts_tpu.ops.qmat import _qdot_group_pallas
    qt, ref = _make_qt(GGML_Q4_K, 128, 4096, rng)
    x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.bfloat16)
    want = np.asarray(x.astype(jnp.float32)) @ ref.T
    got = np.asarray(_qdot_group_pallas(x, qt, interpret=True)
                     .astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=6e-2)


def test_qdot_groupdot_env_dispatch(rng, monkeypatch):
    """qdot routes M=1 bf16 GEMVs (packed or not) through the group kernel
    under MIOTTS_QDOT_GROUPDOT=1 / MIOTTS_QDOT_GEMV=groupdot, and
    MIOTTS_QDOT_GEMV=plain overrides the alias."""
    import miotts_tpu.ops.qmat as qm
    calls = []
    monkeypatch.setenv("MIOTTS_QDOT_GROUPDOT", "1")
    monkeypatch.setattr(qm, "_use_pallas", lambda: True)
    monkeypatch.setattr(qm, "_qdot_group_pallas",
                        lambda x, w: calls.append("group") or qm._qdot_xla(x, w))
    monkeypatch.setattr(qm, "_qdot_pallas",
                        lambda x, w: calls.append("plain") or qm._qdot_xla(x, w))
    qt, _ = _make_qt(GGML_Q8_0, 128, 256, rng)
    q4, _ = _make_qt(GGML_Q4_K, 128, 256, rng)
    qm.qdot(jnp.zeros((1, 256), jnp.bfloat16), qt)      # -> group
    qm.qdot(jnp.zeros((2, 256), jnp.bfloat16), qt)      # M>1 -> plain
    qm.qdot(jnp.zeros((1, 256), jnp.float32), qt)       # f32 -> plain
    qm.qdot(jnp.zeros((1, 256), jnp.bfloat16), q4.pack4())  # packed -> group
    monkeypatch.setenv("MIOTTS_QDOT_GEMV", "plain")
    qm.qdot(jnp.zeros((1, 256), jnp.bfloat16), qt)      # explicit plain wins
    assert calls == ["group", "plain", "plain", "group", "plain"]


def test_qdot_gemv_m8_pads_to_mtile(rng, monkeypatch):
    """MIOTTS_GEMV_M8=1 (VERDICT r4 item 5) routes the M=1 GEMV through the
    8-row M-tile: the kernel sees a padded [8, K] block (unifying M=1 and
    M>=8 numerics on TPU), the result equals the unpadded GEMV, and the
    M=1-only variant kernels (w8a8/groupdot) are bypassed."""
    import miotts_tpu.ops.qmat as qm
    seen = []
    monkeypatch.setattr(qm, "_use_pallas", lambda: True)
    monkeypatch.setattr(
        qm, "_qdot_pallas",
        lambda x, w, **kw: seen.append(x.shape) or qm._qdot_xla(x, w))
    qt, ref = _make_qt(GGML_Q8_0, 128, 256, rng)
    x = jnp.asarray(rng.standard_normal((1, 256)), jnp.float32)
    base = qm.qdot(x, qt)
    monkeypatch.setenv("MIOTTS_GEMV_M8", "1")
    got = qm.qdot(x, qt)
    assert seen == [(1, 256), (8, 256)]
    assert got.shape == (1, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)
    # m8 overrides the M=1-only variant kernels
    monkeypatch.setenv("MIOTTS_QDOT_GEMV", "w8a8")
    monkeypatch.setattr(qm, "_qdot_w8a8_pallas",
                        lambda x, w: seen.append("w8a8") or qm._qdot_xla(x, w))
    got2 = qm.qdot(jnp.asarray(x, jnp.bfloat16), qt)
    assert seen[-1] == (8, 256) and got2.shape == (1, 128)


def test_qdot_groupdot_packed_interpret(rng):
    """Packed-nibble scale-after-dot GEMV (round 3): unpack straight to
    bf16, no per-weight scale multiply — must match the dequant reference
    at bf16-activation precision."""
    from miotts_tpu.ops.qmat import _qdot_group_pallas
    qt, ref = _make_qt(GGML_Q4_K, 256, 512, rng)
    qp = qt.pack4()
    x = jnp.asarray(rng.standard_normal((1, 512)), jnp.bfloat16)
    want = np.asarray(x.astype(jnp.float32)) @ ref.T
    got = np.asarray(_qdot_group_pallas(x, qp, interpret=True)
                     .astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_qdot_groupdot_packed_multi_ktile(rng):
    from miotts_tpu.ops.qmat import _qdot_group_pallas
    qt, ref = _make_qt(GGML_Q4_K, 128, 4096, rng)
    qp = qt.pack4()
    x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.bfloat16)
    want = np.asarray(x.astype(jnp.float32)) @ ref.T
    got = np.asarray(_qdot_group_pallas(x, qp, interpret=True)
                     .astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=6e-2)


def test_qdot_group_pallas_rejects_m_gt_1(rng):
    """ADVICE r2: the group kernel writes only row 0 — direct callers with
    M>1 must fail loudly instead of reading garbage rows."""
    from miotts_tpu.ops.qmat import _qdot_group_pallas
    qt, _ = _make_qt(GGML_Q8_0, 128, 256, rng)
    x = jnp.zeros((2, 256), jnp.bfloat16)
    with pytest.raises(ValueError, match="M=1"):
        _qdot_group_pallas(x, qt, interpret=True)


@pytest.mark.parametrize("gtype", [GGML_Q4_K])
def test_pack4_dequant_identical(gtype, rng):
    """Packed-nibble storage dequantizes identically to unpacked."""
    qt, ref = _make_qt(gtype, 16, 512, rng)
    qp = qt.pack4()
    assert qp.packed and qp.values.shape == (256, qt.values.shape[1])
    np.testing.assert_allclose(np.asarray(qp.dequant()),
                               np.asarray(qt.dequant()), atol=1e-6)


def test_pack4_centered_format(rng):
    """Q4_0 (centered quants) folds the -8 offset into mins when packing."""
    from miotts_tpu.gguf import GGML_Q4_0
    qt, ref = _make_qt(GGML_Q4_0, 8, 512, rng)
    assert qt.mins is None
    qp = qt.pack4()
    assert qp.mins is not None
    np.testing.assert_allclose(np.asarray(qp.dequant()),
                               np.asarray(qt.dequant()), atol=1e-5)


def test_pack4_qdot_matches(rng):
    qt, ref = _make_qt(GGML_Q4_K, 128, 512, rng)
    qp = qt.pack4()
    x = jnp.asarray(rng.standard_normal((3, 512)), jnp.float32)
    a = np.asarray(qdot(x, qt))
    b = np.asarray(qdot(x, qp))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_pack4_pallas_interpret(rng):
    qt, _ = _make_qt(GGML_Q4_K, 256, 512, rng)
    qp = qt.pack4()
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    want = np.asarray(_qdot_xla(x, qp))
    got = np.asarray(_qdot_pallas(x, qp, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qtensor_from_raw_packs_q4(rng):
    """Nibble packing is the DEFAULT for Q4 formats (round 2: the packed
    GEMV kernel measured faster, 4.22 vs 5.40 ms/token @2.6B) and the
    repack is bit-exact; MIOTTS_NO_PACK4=1 restores unpacked storage."""
    from miotts_tpu.ops.qmat import qtensor_from_raw
    from miotts_tpu.gguf.quants import quantize
    w = rng.standard_normal((16, 512)).astype(np.float32)
    raw = np.frombuffer(quantize(w, GGML_Q4_K), dtype=np.uint8)
    qt = qtensor_from_raw(raw, GGML_Q4_K, 16, 512)
    assert qt.packed
    from miotts_tpu.gguf.quants import dequantize
    ref = dequantize(raw, GGML_Q4_K, 16 * 512).reshape(16, 512)
    np.testing.assert_allclose(np.asarray(qt.dequant()), ref, atol=1e-5)

    import os
    os.environ["MIOTTS_NO_PACK4"] = "1"
    try:
        qu = qtensor_from_raw(raw, GGML_Q4_K, 16, 512)
    finally:
        del os.environ["MIOTTS_NO_PACK4"]
    assert not qu.packed
    np.testing.assert_allclose(np.asarray(qu.dequant()), ref, atol=1e-5)
    # non-4-bit formats never pack
    raw8 = np.frombuffer(quantize(w, GGML_Q8_0), dtype=np.uint8)
    assert not qtensor_from_raw(raw8, GGML_Q8_0, 16, 512).packed


def test_bf16_scales_accuracy(rng):
    """bf16 group scales keep error far below the 4-bit quantization noise."""
    from miotts_tpu.ops.qmat import qtensor_from_raw
    from miotts_tpu.gguf.quants import dequantize, quantize
    w = rng.standard_normal((16, 512)).astype(np.float32)
    raw = np.frombuffer(quantize(w, GGML_Q4_K), dtype=np.uint8)
    ref = dequantize(raw, GGML_Q4_K, 16 * 512).reshape(16, 512)
    qt = qtensor_from_raw(raw, GGML_Q4_K, 16, 512, scale_dtype=jnp.bfloat16)
    got = np.asarray(qt.dequant())
    # relative scale rounding ~2^-9; absolute tolerance scaled by magnitude
    np.testing.assert_allclose(got, ref, atol=3e-2)
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    y = np.asarray(qdot(x, qt))
    want = np.asarray(x) @ ref.T
    assert np.abs(y - want).max() / (np.abs(want).max() + 1e-9) < 0.02


def test_qdot_pallas_large_m_tiled(rng):
    """Batched-prefill shapes (M in the thousands) must tile M — an
    untiled [M, K_t] x block + [M, N_t] accumulator blow the ~16 MB VMEM
    scoped limit on TPU (seen at M=1024, 2.6B wo shapes)."""
    qt, ref = _make_qt(GGML_Q4_K, 128, 512, rng)
    x = jnp.asarray(rng.standard_normal((1024, 512)), jnp.float32)
    got = np.asarray(_qdot_pallas(x, qt, interpret=True))
    want = np.asarray(x) @ ref.T
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_concat_heterogeneous_formats(rng):
    """Q4_K (group 32, mins) fused with Q6_K (group 16, no mins) — the mix
    real llama.cpp Q4_K_M files have per layer — must dequantize and qdot
    exactly like the unfused tensors."""
    from miotts_tpu.ops.qmat import concat_qtensors

    qa, ra = _make_qt(GGML_Q4_K, 16, 512, rng)
    qb, rb = _make_qt(GGML_Q6_K, 24, 512, rng)
    qc, rc = _make_qt(GGML_Q8_0, 8, 512, rng)
    fused = concat_qtensors([qa, qb, qc])
    assert fused.shape == (48, 512)
    ref = np.concatenate([ra, rb, rc], axis=0)
    np.testing.assert_allclose(np.asarray(fused.dequant()), ref, atol=1e-6)

    x = jnp.asarray(rng.standard_normal((3, 512)), jnp.float32)
    got = np.asarray(qdot(x, fused))
    want = np.asarray(x) @ ref.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_concat_mixed_dense_quant_rejected(rng):
    from miotts_tpu.ops.qmat import concat_qtensors

    qt, _ = _make_qt(GGML_Q8_0, 8, 256, rng)
    with pytest.raises(ValueError):
        concat_qtensors([qt, jnp.zeros((8, 256), jnp.float32)])


def test_qdot_pallas_split_interpret(rng):
    """Split-x packed kernel == XLA dequant path (exact f32 math, no
    concat, two half-K dots — round 3)."""
    from miotts_tpu.ops.qmat import _qdot_pallas_split
    qt, _ = _make_qt(GGML_Q4_K, 256, 512, rng)
    qp = qt.pack4()
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    want = np.asarray(_qdot_xla(x, qp))
    got = np.asarray(_qdot_pallas_split(x, qp, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qdot_pallas_split_multi_ktile(rng):
    from miotts_tpu.ops.qmat import _qdot_pallas_split
    qt, _ = _make_qt(GGML_Q4_K, 128, 4096, rng)
    qp = qt.pack4()
    x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
    want = np.asarray(_qdot_xla(x, qp))
    got = np.asarray(_qdot_pallas_split(x, qp, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qdot_pallas_split_rejects_unpacked(rng):
    from miotts_tpu.ops.qmat import _qdot_pallas_split
    qt, _ = _make_qt(GGML_Q4_K, 128, 512, rng)
    with pytest.raises(ValueError, match="packed"):
        _qdot_pallas_split(jnp.zeros((1, 512), jnp.float32), qt,
                           interpret=True)


def test_pack4_split_env_dispatch(rng, monkeypatch):
    """MIOTTS_PACK4_SPLIT=1 routes packed qdots through the split kernel."""
    import miotts_tpu.ops.qmat as qm
    calls = []
    monkeypatch.setenv("MIOTTS_PACK4_SPLIT", "1")
    monkeypatch.delenv("MIOTTS_QDOT_GROUPDOT", raising=False)
    monkeypatch.delenv("MIOTTS_QDOT_GEMV", raising=False)
    monkeypatch.setattr(qm, "_use_pallas", lambda: True)
    monkeypatch.setattr(qm, "_qdot_pallas_split",
                        lambda x, w: calls.append("split") or qm._qdot_xla(x, w))
    monkeypatch.setattr(qm, "_qdot_pallas",
                        lambda x, w: calls.append("plain") or qm._qdot_xla(x, w))
    q4, _ = _make_qt(GGML_Q4_K, 128, 256, rng)
    qm.qdot(jnp.zeros((1, 256), jnp.float32), q4.pack4())   # -> split
    qm.qdot(jnp.zeros((1, 256), jnp.float32), q4)           # unpacked -> plain
    assert calls == ["split", "plain"]


def test_qdot_pallas_bf16dot_interpret(rng):
    """bf16 dequant+dot kernel variant == the XLA bf16 fallback's numerics
    class (w rounds to bf16 after the scale multiply; f32 accumulation)."""
    qt, ref = _make_qt(GGML_Q4_K, 256, 512, rng)
    qp = qt.pack4()
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.bfloat16)
    want = np.asarray(x.astype(jnp.float32)) @ ref.T
    for q in (qt, qp):
        got = np.asarray(_qdot_pallas(x, q, interpret=True, bf16_dot=True)
                         .astype(jnp.float32))
        # bf16 w-rounding gives an ABSOLUTE error ~ sqrt(K)*2^-9*|x||w| per
        # output, so small outputs have large relative error; the honest
        # bound is the relative RMS over the output vector
        rel_rms = (np.linalg.norm(got - want)
                   / max(np.linalg.norm(want), 1e-9))
        xla_bf16 = np.asarray(_qdot_xla(x, q).astype(jnp.float32))
        xla_rel = (np.linalg.norm(xla_bf16 - want)
                   / max(np.linalg.norm(want), 1e-9))
        # same numerics class as (in fact slightly tighter than) the XLA
        # bf16 fallback: measured ~0.59% vs its 0.69% on this fixture
        assert rel_rms < 1e-2, rel_rms
        assert rel_rms <= xla_rel * 1.5, (rel_rms, xla_rel)


def test_bf16dot_env_dispatch(rng, monkeypatch):
    """MIOTTS_QDOT_BF16=1 selects the bf16 kernel for bf16 activations
    only (f32 activations keep the exact f32 kernel)."""
    import miotts_tpu.ops.qmat as qm
    calls = []
    monkeypatch.setenv("MIOTTS_QDOT_BF16", "1")
    monkeypatch.delenv("MIOTTS_QDOT_GROUPDOT", raising=False)
    monkeypatch.delenv("MIOTTS_PACK4_SPLIT", raising=False)
    monkeypatch.setattr(qm, "_use_pallas", lambda: True)
    monkeypatch.setattr(
        qm, "_qdot_pallas",
        lambda x, w, bf16_dot=False: calls.append(
            "bf16" if bf16_dot else "f32") or qm._qdot_xla(x, w))
    qt, _ = _make_qt(GGML_Q8_0, 128, 256, rng)
    qm.qdot(jnp.zeros((1, 256), jnp.bfloat16), qt)   # -> bf16 kernel
    qm.qdot(jnp.zeros((1, 256), jnp.float32), qt)    # -> exact f32 kernel
    assert calls == ["bf16", "f32"]


def test_qdot_pallas_bf16after_interpret(rng):
    """'after' mode: f32 dequant, one bf16 cast at the MXU boundary —
    bf16-class output (both x and w round to bf16 for the dot)."""
    qt, ref = _make_qt(GGML_Q4_K, 256, 512, rng)
    qp = qt.pack4()
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    want = np.asarray(x) @ ref.T
    for q in (qt, qp):
        got = np.asarray(_qdot_pallas(x, q, interpret=True,
                                      bf16_dot="after"))
        rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
        assert rel < 1e-2, rel


# ---------------------------------------------------------------------------
# W8A8 int8-MXU GEMV (round 4)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gtype,packed", [
    (GGML_Q8_0, False), (GGML_Q6_K, False),
    (GGML_Q4_K, False), (GGML_Q4_K, True),
])
def test_qdot_w8a8_interpret_accuracy(gtype, packed, rng):
    """W8A8 GEMV (int8 activations, int8 MXU dot, scales after) must match
    the f32-dequant reference within the activation-quantization bound.

    The bound is part of the VERDICT r3 item-1 contract: per-group int8
    activation quant adds <=1/254 of the group absmax per element; measured
    RMS relative error must stay well under the Q4/Q6 weight noise."""
    from miotts_tpu.ops.qmat import _qdot_w8a8_pallas
    qt, ref = _make_qt(gtype, 256, 512, rng)
    if packed:
        qt = qt.pack4()
    x = jnp.asarray(rng.standard_normal((1, 512)), jnp.float32)
    want = np.asarray(x) @ ref.T
    got = np.asarray(_qdot_w8a8_pallas(x, qt, interpret=True))
    rms_rel = (np.sqrt(np.mean((got - want) ** 2))
               / (np.sqrt(np.mean(want ** 2)) + 1e-12))
    assert rms_rel < 0.01, f"W8A8 RMS relative error {rms_rel:.4f}"
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.5)


def test_qdot_w8a8_multi_ktile(rng):
    """Multiple K tiles: per-tile partial sums and per-tile sx blocks must
    compose exactly (8192-K forces >=2 tiles under the VMEM bound)."""
    from miotts_tpu.ops.qmat import _qdot_w8a8_pallas
    qt, ref = _make_qt(GGML_Q4_K, 128, 8192, rng)
    qp = qt.pack4()
    x = jnp.asarray(rng.standard_normal((1, 8192)) * 0.1, jnp.float32)
    want = np.asarray(x) @ ref.T
    for q in (qt, qp):
        got = np.asarray(_qdot_w8a8_pallas(x, q, interpret=True))
        rms_rel = (np.sqrt(np.mean((got - want) ** 2))
                   / (np.sqrt(np.mean(want ** 2)) + 1e-12))
        assert rms_rel < 0.01, f"packed={q.packed}: {rms_rel:.4f}"


def test_qdot_w8a8_bf16_activations(rng):
    """bf16 decode activations route through the same quantization (cast to
    f32 first) and return bf16."""
    from miotts_tpu.ops.qmat import _qdot_w8a8_pallas
    qt, ref = _make_qt(GGML_Q6_K, 128, 512, rng)
    x = jnp.asarray(rng.standard_normal((1, 512)), jnp.bfloat16)
    want = np.asarray(x.astype(jnp.float32)) @ ref.T
    got = np.asarray(_qdot_w8a8_pallas(x, qt, interpret=True)
                     .astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.5)


def test_qdot_w8a8_rejects_m_gt_1(rng):
    from miotts_tpu.ops.qmat import _qdot_w8a8_pallas
    qt, _ = _make_qt(GGML_Q8_0, 128, 256, rng)
    with pytest.raises(ValueError, match="M=1"):
        _qdot_w8a8_pallas(jnp.zeros((2, 256), jnp.float32), qt,
                          interpret=True)


def test_qdot_w8a8_env_dispatch(rng, monkeypatch):
    """qdot routes M=1 GEMVs (any activation dtype, packed or not) through
    the W8A8 kernel under MIOTTS_QDOT_GEMV=w8a8."""
    import miotts_tpu.ops.qmat as qm
    calls = []
    monkeypatch.setenv("MIOTTS_QDOT_GEMV", "w8a8")
    monkeypatch.setattr(qm, "_use_pallas", lambda: True)
    monkeypatch.setattr(qm, "_qdot_w8a8_pallas",
                        lambda x, w: calls.append("w8a8") or qm._qdot_xla(x, w))
    monkeypatch.setattr(qm, "_qdot_pallas",
                        lambda x, w: calls.append("plain") or qm._qdot_xla(x, w))
    qt, _ = _make_qt(GGML_Q8_0, 128, 256, rng)
    q4, _ = _make_qt(GGML_Q4_K, 128, 256, rng)
    qm.qdot(jnp.zeros((1, 256), jnp.bfloat16), qt)      # -> w8a8
    qm.qdot(jnp.zeros((1, 256), jnp.float32), qt)       # f32 M=1 -> w8a8 too
    qm.qdot(jnp.zeros((2, 256), jnp.bfloat16), qt)      # M>1 -> plain
    qm.qdot(jnp.zeros((1, 256), jnp.bfloat16), q4.pack4())  # packed -> w8a8
    assert calls == ["w8a8", "w8a8", "plain", "w8a8"]

"""gguf-core tests: container round-trip + quant codec bit-layout checks.

Mirrors the reference test strategy (SURVEY.md §4.1: check_weights.py-style
max-abs-diff validation), using self-built GGUF files since no upstream model
files are available offline.
"""

import numpy as np
import pytest

from miotts_tpu.gguf import (
    GGUFReader, GGUFWriter, load_voice_embedding, write_voice_embedding,
    to_group_quant, GGML_BF16, GGML_F16, GGML_F32, GGML_I32,
    GGML_Q4_0, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K, GGML_Q8_0,
)
from miotts_tpu.gguf.quants import dequantize, quantize


def test_container_roundtrip(tmp_path, rng):
    path = str(tmp_path / "t.gguf")
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "test")
    w.add_kv("test.count", 7)
    w.add_kv("test.rate", 1.5)
    w.add_kv("test.flag", True)
    w.add_array("test.factors", [6, 3])
    w.add_array("test.names", ["a", "bb"])
    a = rng.standard_normal((8, 64)).astype(np.float32)
    b = rng.integers(0, 100, size=(5,)).astype(np.int32)
    w.add_tensor("weights.a", a, GGML_F32)
    w.add_tensor("idx", b, GGML_I32)
    w.write()

    with GGUFReader(path) as r:
        assert r.version == 3
        assert r.kv["general.architecture"] == "test"
        assert r.get_u32("test.count") == 7
        assert r.get_f32("test.rate") == 1.5
        assert r.kv["test.flag"] is True
        assert list(r.kv["test.factors"]) == [6, 3]
        assert list(r.kv["test.names"]) == ["a", "bb"]
        info = r.tensors["weights.a"]
        assert info.ne == (64, 8)          # ggml order: ne[0] fastest
        assert info.shape == (8, 64)       # numpy order
        np.testing.assert_array_equal(r.tensor_f32("weights.a"), a)
        np.testing.assert_array_equal(r.tensor_np("idx"), b)


def test_alignment_of_tensor_offsets(tmp_path, rng):
    path = str(tmp_path / "align.gguf")
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "test")
    # 5-element f32 tensor = 20 bytes -> forces padding before the next one
    w.add_tensor("a", rng.standard_normal(5).astype(np.float32), GGML_F32)
    w.add_tensor("b", rng.standard_normal(32).astype(np.float32), GGML_F32)
    w.write()
    with GGUFReader(path) as r:
        assert r.data_offset % 32 == 0
        assert r.tensors["b"].offset % 32 == 0
        assert r.tensor_f32("b").shape == (32,)


@pytest.mark.parametrize("gtype,atol", [
    (GGML_F16, 1e-3),
    (GGML_BF16, 1e-2),
    (GGML_Q8_0, 2e-2),
    (GGML_Q4_0, 0.4),
    (GGML_Q5_K, 0.12),
    (GGML_Q4_K, 0.25),
    (GGML_Q6_K, 0.06),
])
def test_quant_roundtrip_error(gtype, atol, rng):
    """Quantize→dequantize must reconstruct within format-appropriate error."""
    x = rng.standard_normal((4, 512)).astype(np.float32)
    raw = np.frombuffer(quantize(x, gtype), dtype=np.uint8)
    y = dequantize(raw, gtype, x.size).reshape(x.shape)
    err = np.abs(x - y).max()
    assert err < atol, f"max reconstruction error {err}"


@pytest.mark.parametrize("gtype", [GGML_Q8_0, GGML_Q4_0, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K])
def test_group_quant_matches_dequant(gtype, rng):
    """Planar GroupQuant repack must dequantize identically to the reference
    block dequantizer (bit-exact dequant path is the parity contract,
    SURVEY.md §2.2)."""
    rows, cols = 6, 512
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    raw = np.frombuffer(quantize(x, gtype), dtype=np.uint8)
    ref = dequantize(raw, gtype, x.size).reshape(rows, cols)
    gq = to_group_quant(raw, gtype, rows, cols)
    np.testing.assert_allclose(gq.dequant(), ref, rtol=0, atol=1e-6)


def test_q8_0_bit_layout(rng):
    """Hand-check one Q8_0 block against the ggml layout [f16 d][32 i8]."""
    x = np.linspace(-1, 1, 32).astype(np.float32)
    raw = np.frombuffer(quantize(x, GGML_Q8_0), dtype=np.uint8)
    assert raw.size == 34
    d = raw[:2].view(np.float16)[0]
    q = raw[2:].view(np.int8).astype(np.float32)
    np.testing.assert_allclose(q * float(d), dequantize(raw, GGML_Q8_0, 32), atol=1e-7)
    # max-magnitude element maps to ±127
    assert np.abs(q).max() == 127


def test_q6_k_scale_groups(rng):
    """Q6_K uses per-16 scales: a block with wildly different group magnitudes
    must reconstruct each group at its own scale."""
    x = np.zeros(256, dtype=np.float32)
    x[:16] = rng.standard_normal(16) * 100.0
    x[16:32] = rng.standard_normal(16) * 2.0
    raw = np.frombuffer(quantize(x, GGML_Q6_K), dtype=np.uint8)
    y = dequantize(raw, GGML_Q6_K, 256)
    assert np.abs(x[:16] - y[:16]).max() < 100 * 0.05
    # small group keeps its own (much finer) scale: relative error stays small
    assert np.abs(x[16:32] - y[16:32]).max() < 2.0 * 0.08


def test_voice_embedding_roundtrip(tmp_path, rng):
    emb = rng.standard_normal(128).astype(np.float32)
    path = str(tmp_path / "voice.emb.gguf")
    write_voice_embedding(path, emb, name="test-voice")
    got = load_voice_embedding(path)
    np.testing.assert_array_equal(got, emb)
    with GGUFReader(path) as r:
        assert r.kv["general.architecture"] == "mio-embedding"
        assert r.get_u32("mio.embedding.dim") == 128


def test_bf16_quantize_rtne_and_nan():
    """bf16 conversion is round-to-nearest-even and NaN-preserving
    (ggml fp32_to_bf16 semantics) — half-up rounding laundered NaNs into
    +Inf and wrapped negative NaNs to +0.0 (regression)."""
    import ml_dtypes
    from miotts_tpu.gguf.quants import quantize_bf16

    x = np.array([1.00390625, -1.5, 3.14159, 1e-40, 65504.0, 0.0, -0.0],
                 np.float32)
    got = np.frombuffer(quantize_bf16(x), np.uint16)
    ref = x.astype(ml_dtypes.bfloat16).view(np.uint16)
    np.testing.assert_array_equal(got, ref)

    nans = np.frombuffer(
        np.array([0x7F800001, 0xFFC00000, 0xFFFFFFFF], np.uint32).tobytes(),
        np.float32)
    out = np.frombuffer(quantize_bf16(nans), np.uint16)
    assert np.isnan(out.view(ml_dtypes.bfloat16).astype(np.float32)).all()

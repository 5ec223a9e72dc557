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


def _build_q4_k_block(d, dmin, sc6, mn6, q):
    """Hand-assemble one 144-byte Q4_K super-block from the ggml spec.

    Layout (llama.cpp block_q4_K; formats per /root/reference/README.md:196,
    consumed opaquely by the reference at src/test-to-speech.cpp:49):
      bytes 0-1   f16 d        (super scale)
      bytes 2-3   f16 dmin     (super min)
      bytes 4-15  12-byte packed 6-bit scales/mins (write side of ggml
                  get_scale_min_k4):
                    j<4:  byte[j]   = sc[j]   | (sc[j+4]>>4)<<6
                          byte[j+4] = mn[j]   | (mn[j+4]>>4)<<6
                          byte[j+8] = (sc[j+4]&0xF) | (mn[j+4]&0xF)<<4
      bytes 16-143  128 nibble bytes: chunk c of 4 (32 bytes each); byte l
                  holds element c*64+l in its LOW nibble and element
                  c*64+32+l in its HIGH nibble.

    All bit placements are written inline here, independently of
    gguf/quants.py's own packer — this test is the spec anchor.
    """
    blk = np.zeros(144, dtype=np.uint8)
    blk[0:2] = np.frombuffer(np.float16(d).tobytes(), np.uint8)
    blk[2:4] = np.frombuffer(np.float16(dmin).tobytes(), np.uint8)
    for j in range(4):
        blk[4 + j] = (sc6[j] & 63) | (((sc6[j + 4] >> 4) & 3) << 6)
        blk[8 + j] = (mn6[j] & 63) | (((mn6[j + 4] >> 4) & 3) << 6)
        blk[12 + j] = (sc6[j + 4] & 0xF) | ((mn6[j + 4] & 0xF) << 4)
    for c in range(4):
        for l in range(32):
            blk[16 + c * 32 + l] = (q[c * 64 + l] & 0xF) | ((q[c * 64 + 32 + l] & 0xF) << 4)
    return blk


def test_q4_k_bit_layout_hand_built():
    """Decoder pinned to the Q4_K spec via hand-built super-block bytes.

    The repo's other K-quant tests are own-writer->own-reader round trips; a
    consistent spec misread would pass them all and decode real checkpoints
    to garbage.  Here every byte is placed by hand from the ggml layout and
    the expected floats are computed from first principles:
        w[i] = d * sc6[i//32] * q[i] - dmin * mn6[i//32]
    Scale/min values are chosen with nonzero HIGH bits for j>=4 (where the
    6-bit packing splits 4+2 across bytes) and distinct low nibbles, so any
    bit-position error changes the result.  Two blocks with different
    patterns also pin the 144-byte block stride.
    """
    # powers-of-two super scales => all float products exact in f32
    specs = [
        (0.5, 0.25,
         [7, 21, 35, 63, 18, 41, 52, 9],     # j>=4 entries have high bits set
         [3, 14, 60, 27, 33, 50, 12, 45],
         [(3 * i + i // 32) % 16 for i in range(256)]),
        (1.5, 0.75,
         [9, 52, 41, 18, 63, 35, 21, 7],
         [45, 12, 50, 33, 27, 60, 14, 3],
         [(5 * i + 2 + i // 64) % 16 for i in range(256)]),
    ]
    raw = np.concatenate([_build_q4_k_block(*s) for s in specs])
    got = dequantize(raw, GGML_Q4_K, 512)
    expect = np.empty(512, dtype=np.float64)
    for b, (d, dmin, sc6, mn6, q) in enumerate(specs):
        for i in range(256):
            expect[b * 256 + i] = d * sc6[i // 32] * q[i] - dmin * mn6[i // 32]
    np.testing.assert_array_equal(got, expect.astype(np.float32))

    # the device repack path must read the identical layout
    gq = to_group_quant(raw, GGML_Q4_K, 2, 256)
    np.testing.assert_allclose(gq.dequant().reshape(-1),
                               expect.astype(np.float32), rtol=0, atol=0)
    for b, (d, dmin, sc6, mn6, q) in enumerate(specs):
        np.testing.assert_array_equal(gq.values[b], np.asarray(q))
        np.testing.assert_array_equal(
            gq.scales[b], np.float32(d) * np.asarray(sc6, np.float32))
        np.testing.assert_array_equal(
            gq.mins[b], np.float32(dmin) * np.asarray(mn6, np.float32))


def _build_q6_k_block(d, sc8, q6):
    """Hand-assemble one 210-byte Q6_K super-block from the ggml spec.

    Layout (llama.cpp block_q6_K):
      bytes 0-127   ql: low 4 bits of the 6-bit quants
      bytes 128-191 qh: high 2 bits, four element groups per byte
      bytes 192-207 16 int8 per-16-element scales
      bytes 208-209 f16 d
    Bit positions (per half of 128 elements, l in 0..31, base = half*128):
      ql[half*64 + l]      = q[base+l]&0xF    | (q[base+64+l]&0xF)<<4
      ql[half*64 + 32 + l] = q[base+32+l]&0xF | (q[base+96+l]&0xF)<<4
      qh[half*32 + l]      = (q[base+l]>>4) | (q[base+32+l]>>4)<<2
                           | (q[base+64+l]>>4)<<4 | (q[base+96+l]>>4)<<6
    q6 here is the RAW unsigned 6-bit value (0..63); dequant subtracts 32.
    """
    blk = np.zeros(210, dtype=np.uint8)
    for half in range(2):
        base = half * 128
        for l in range(32):
            a, b = q6[base + l], q6[base + 32 + l]
            c, e = q6[base + 64 + l], q6[base + 96 + l]
            blk[half * 64 + l] = (a & 0xF) | ((c & 0xF) << 4)
            blk[half * 64 + 32 + l] = (b & 0xF) | ((e & 0xF) << 4)
            blk[128 + half * 32 + l] = ((a >> 4) | ((b >> 4) << 2)
                                        | ((c >> 4) << 4) | ((e >> 4) << 6))
    blk[192:208] = np.asarray(sc8, dtype=np.int8).view(np.uint8)
    blk[208:210] = np.frombuffer(np.float16(d).tobytes(), np.uint8)
    return blk


def test_q6_k_bit_layout_hand_built():
    """Decoder pinned to the Q6_K spec via hand-built super-block bytes.

    Expected floats from first principles: w[i] = d * sc8[i//16] * (q6[i]-32).
    q6 covers the full 0..63 range (both nibble halves of ql AND all four
    2-bit positions of qh, in both 128-element halves where the packing
    shifts); scales include negatives.  Two blocks pin the 210-byte stride.
    """
    specs = [
        (0.25,
         [1, -2, 3, -4, 5, -6, 7, -8, 100, -100, 9, -10, 11, -12, 13, -128],
         [(11 * i + 5) % 64 for i in range(256)]),
        (0.0625,
         [-128, 13, -12, 11, -10, 9, -100, 100, -8, 7, -6, 5, -4, 3, -2, 1],
         [(7 * i + 3 + i // 32) % 64 for i in range(256)]),
    ]
    raw = np.concatenate([_build_q6_k_block(*s) for s in specs])
    got = dequantize(raw, GGML_Q6_K, 512)
    expect = np.empty(512, dtype=np.float64)
    for b, (d, sc8, q6) in enumerate(specs):
        for i in range(256):
            expect[b * 256 + i] = d * sc8[i // 16] * (q6[i] - 32)
    np.testing.assert_array_equal(got, expect.astype(np.float32))

    gq = to_group_quant(raw, GGML_Q6_K, 2, 256)
    np.testing.assert_allclose(gq.dequant().reshape(-1),
                               expect.astype(np.float32), rtol=0, atol=0)
    for b, (d, sc8, q6) in enumerate(specs):
        np.testing.assert_array_equal(gq.values[b],
                                      np.asarray(q6, np.int32) - 32)
        np.testing.assert_array_equal(
            gq.scales[b], np.float32(d) * np.asarray(sc8, np.float32))


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

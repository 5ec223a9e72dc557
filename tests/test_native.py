"""Native C++ host library tests: bit-identical to the numpy reference."""

import numpy as np
import pytest

from miotts_tpu.gguf import GGML_Q4_K, GGML_Q6_K, GGML_Q8_0, to_group_quant
from miotts_tpu.gguf import native
from miotts_tpu.gguf.quants import quantize
from miotts_tpu.ops.qmat import qtensor_from_raw

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++?)")


def test_f16_bf16_conversion(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    h = x.astype(np.float16)
    got = native.f16_to_f32(h.view(np.uint16))
    np.testing.assert_array_equal(got, h.astype(np.float32))
    # bf16
    b = ((x.view(np.uint32) >> 16).astype(np.uint16))
    got = native.bf16_to_f32(b)
    want = (b.astype(np.uint32) << 16).view(np.float32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("gtype,repack,group,has_min", [
    (GGML_Q8_0, native.repack_q8_0_t, 32, False),
    (GGML_Q6_K, native.repack_q6_k_t, 16, False),
    (GGML_Q4_K, native.repack_q4_k_t, 32, True),
])
def test_repack_matches_numpy(gtype, repack, group, has_min, rng):
    rows, cols = 24, 512
    w = rng.standard_normal((rows, cols)).astype(np.float32)
    raw = np.frombuffer(quantize(w, gtype), dtype=np.uint8)
    gq = to_group_quant(raw, gtype, rows, cols)
    out = repack(raw, rows, cols)
    if has_min:
        v, s, m = out
        np.testing.assert_array_equal(m, gq.mins.T)
    else:
        v, s = out
    np.testing.assert_array_equal(v, gq.values.T)
    np.testing.assert_allclose(s, gq.scales.T, rtol=1e-6)


@pytest.mark.parametrize("gtype", [GGML_Q8_0, GGML_Q6_K, GGML_Q4_K])
def test_qtensor_from_raw_native_matches_numpy(gtype, rng):
    import os
    rows, cols = 24, 512
    w = rng.standard_normal((rows, cols)).astype(np.float32)
    raw = np.frombuffer(quantize(w, gtype), dtype=np.uint8)
    qt_native = qtensor_from_raw(raw, gtype, rows, cols)
    # force numpy path
    from miotts_tpu.ops.qmat import QTensor
    qt_np = QTensor.from_group_quant(to_group_quant(raw, gtype, rows, cols))
    np.testing.assert_allclose(np.asarray(qt_native.dequant()),
                               np.asarray(qt_np.dequant()), atol=1e-6)


def test_f32_to_s16(rng):
    """Reference clamp semantics (wav-writer.cpp:39-42): scale THEN clamp,
    so s <= -32768/32767 maps to -32768 (not -32767)."""
    x = rng.standard_normal(5000).astype(np.float32) * 1.5  # some clipping
    got = native.f32_to_s16(x)
    want = np.clip(x * np.float32(32767.0), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got, want)
    assert native.f32_to_s16(np.float32([-2.0]))[0] == -32768
    # numpy fallback in audio.wav must agree exactly
    from miotts_tpu.audio.wav import f32_to_s16 as wav_conv
    np.testing.assert_array_equal(wav_conv(x), got)


def test_f16_subnormal_exact():
    """Subnormal f16 (|x| < 2^-14) must decode bit-exactly: tiny Q8_0/K-quant
    block scales are subnormal for near-zero weight blocks, and an
    exponent off-by-one here silently halved them (regression)."""
    if native._build_and_load() is None:
        pytest.skip("native library unavailable")
    edge = np.array([0x0001, 0x0002, 0x0200, 0x03FF, 0x0400, 0x8001,
                     0x83FF, 0x0000, 0x8000, 0x3C00, 0x7BFF], np.uint16)
    got = native.f16_to_f32(edge)
    want = np.frombuffer(edge.tobytes(), dtype=np.float16).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_repack_subnormal_scale_blocks(rng):
    """A Q8_0 tensor whose blocks are all tiny (max|w| < 2^-14 * 127) gets
    subnormal f16 block scales; native repack must match numpy exactly."""
    if native._build_and_load() is None:
        pytest.skip("native library unavailable")
    w = (rng.standard_normal((8, 256)) * 1e-6).astype(np.float32)
    raw = np.frombuffer(quantize(w, GGML_Q8_0), dtype=np.uint8)
    gq_np = to_group_quant(raw, GGML_Q8_0, 8, 256)
    vals, scales = native.repack_q8_0_t(raw, 8, 256)
    np.testing.assert_array_equal(vals, np.ascontiguousarray(gq_np.values.T))
    np.testing.assert_array_equal(scales,
                                  np.ascontiguousarray(gq_np.scales.T))

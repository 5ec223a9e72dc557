"""MioCodec decoder tests: GGUF load, numpy cross-check, bucketing exactness."""

import numpy as np
import jax.numpy as jnp
import pytest

from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models.codec import (
    CodecConfig, codec_decode_audio, codec_decode_spec, load_codec_params,
)
from miotts_tpu.models.synthetic import synthetic_codec_config, write_synthetic_codec

import ref_codec


@pytest.fixture(scope="module")
def tiny_codec(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("codec") / "codec.gguf")
    cfg = write_synthetic_codec(path, n_codes=64, seed=3)
    with GGUFReader(path) as r:
        cfg2 = CodecConfig.from_gguf(r)
        # eps fields round-trip through f32 KV storage; compare the rest
        assert cfg2.prenet_layers == cfg.prenet_layers
        assert cfg2.decoder_dim == cfg.decoder_dim
        assert cfg2.up_factors == cfg.up_factors
        assert cfg2.up_kernels == cfg.up_kernels
        assert abs(cfg2.norm_eps - cfg.norm_eps) < 1e-9
        params, _ = load_codec_params(r, cfg2)
    return params, cfg2


def test_config_from_gguf_roundtrip(tiny_codec):
    _, cfg = tiny_codec
    assert cfg.up_factors == (3, 3)
    assert cfg.total_upsample == 18
    assert cfg.samples_per_token == cfg.total_upsample * cfg.hop_length


def test_decode_shapes(tiny_codec, rng):
    params, cfg = tiny_codec
    T = 6
    codes = jnp.asarray(rng.integers(0, 64, T), jnp.int32)
    emb = jnp.asarray(rng.standard_normal(cfg.adaln_dim), jnp.float32)
    log_mag, phase = codec_decode_spec(params, codes, emb, cfg)
    S_final = T * cfg.total_upsample
    assert log_mag.shape == (S_final, cfg.n_freq)
    assert phase.shape == (S_final, cfg.n_freq)
    audio = codec_decode_audio(params, codes, emb, cfg)
    assert audio.shape == (T * cfg.samples_per_token,)
    assert np.isfinite(np.asarray(audio)).all()


def test_spec_matches_numpy_reference(tiny_codec, rng):
    """Cross-check the JAX transcription against an independently-written
    scalar/loop numpy implementation (float64)."""
    params, cfg = tiny_codec
    T = 5
    codes = rng.integers(0, 64, T)
    emb = rng.standard_normal(cfg.adaln_dim).astype(np.float32) * 0.5
    got_lm, got_ph = codec_decode_spec(
        params, jnp.asarray(codes, jnp.int32), jnp.asarray(emb), cfg)
    want_lm, want_ph = ref_codec.ref_codec_spec(params, codes, emb, cfg)
    np.testing.assert_allclose(np.asarray(got_lm), want_lm, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_ph), want_ph, atol=5e-4)


def test_decoder_layer_substeps(tiny_codec, rng):
    """Sub-op bisection inside one wave_decoder layer
    (debug_decoder_substeps.py:75-229 granularity): the manual expansion
    must match the production layer math, layer_in at layer 0 must equal
    the prior-stage output, and layer_out at the LAST layer must equal the
    whole decoder-stack output."""
    from miotts_tpu.models.codec import (
        codec_decode_stages, codec_decoder_layer_substeps,
    )
    import jax
    params, cfg = tiny_codec
    codes = rng.integers(0, 64, 4)
    emb = rng.standard_normal(cfg.adaln_dim).astype(np.float32) * 0.5
    stages, _ = codec_decode_stages(params, codes, emb, cfg)

    subs, max_diff = codec_decoder_layer_substeps(params, codes, emb, cfg, 0)
    assert max_diff < 1e-5
    for key in ("silu_cond", "attn_cond_out", "attn_shift", "attn_scale",
                "attn_gate", "x_norm", "x_modulated", "q_proj", "k_proj",
                "v_proj", "q_rope", "k_rope", "attn_scores", "attn_probs",
                "attn_ctx", "attn_out", "gated_attn", "attn_residual",
                "ffn_cond_out", "h_norm", "h_modulated", "ffn_gate_proj",
                "ffn_up_proj", "ffn_silu_gate", "ffn_gated", "ffn_out",
                "gated_ffn", "layer_out"):
        assert key in subs, key
    np.testing.assert_allclose(subs["layer_in"], stages["prior"], atol=1e-6)
    # softmax rows sum to 1
    np.testing.assert_allclose(subs["attn_probs"].sum(-1), 1.0, atol=1e-5)

    n_layers = jax.tree_util.tree_leaves(
        params["decoder_blocks"])[0].shape[0]
    last, max_diff_last = codec_decoder_layer_substeps(
        params, codes, emb, cfg, n_layers - 1)
    assert max_diff_last < 1e-5
    np.testing.assert_allclose(last["layer_out"], stages["decoder"],
                               atol=1e-4)
    with pytest.raises(ValueError):
        codec_decoder_layer_substeps(params, codes, emb, cfg, n_layers)


def test_bucketed_decode_matches_unpadded(tiny_codec, rng):
    """Decoding T codes padded to a larger bucket with n_real=T must equal
    the unpadded decode on the real prefix — attention masking, masked
    GroupNorm and conv zeroing together (streaming bucketing contract)."""
    params, cfg = tiny_codec
    T, T_pad = 6, 10
    codes = rng.integers(0, 64, T)
    pad_codes = np.concatenate([codes, rng.integers(0, 64, T_pad - T)])
    emb = jnp.asarray(rng.standard_normal(cfg.adaln_dim), jnp.float32)

    full = np.asarray(codec_decode_audio(
        params, jnp.asarray(codes, jnp.int32), emb, cfg))
    padded = np.asarray(codec_decode_audio(
        params, jnp.asarray(pad_codes, jnp.int32), emb, cfg,
        n_real=jnp.asarray(T, jnp.int32)))
    n = T * cfg.samples_per_token
    np.testing.assert_allclose(padded[:n], full, atol=1e-4)


def test_voice_embedding_conditions_output(tiny_codec, rng):
    params, cfg = tiny_codec
    codes = jnp.asarray(rng.integers(0, 64, 4), jnp.int32)
    e1 = jnp.asarray(rng.standard_normal(cfg.adaln_dim), jnp.float32)
    e2 = jnp.asarray(rng.standard_normal(cfg.adaln_dim), jnp.float32)
    a1 = np.asarray(codec_decode_audio(params, codes, e1, cfg))
    a2 = np.asarray(codec_decode_audio(params, codes, e2, cfg))
    assert np.abs(a1 - a2).max() > 1e-6


def test_conv_transpose_trim_lengths(tiny_codec, rng):
    """Upsampler stage lengths: (S-1)*f + k, trimmed by (k-f)/2 per side
    -> S*f exactly (`miocodec.cpp:681-696`)."""
    _, cfg = tiny_codec
    S = 10
    for f, k in zip(cfg.up_factors, cfg.up_kernels):
        raw = (S - 1) * f + k
        trimmed = raw - 2 * ((k - f) // 2)
        assert trimmed == S * f
        S = S * f


def test_codec_stages_match_committed_goldens():
    """Regression pin: the tiny-fixture codec stages must match the
    committed goldens bit-closely (SURVEY.md §4.1 golden strategy) — any
    numerical change to the decoder math trips this."""
    import os
    golden_path = os.path.join(os.path.dirname(__file__), "goldens",
                               "codec_stages_tiny.npz")
    from miotts_tpu.models.codec import codec_decode_stages
    from miotts_tpu.models.synthetic import write_synthetic_codec
    from miotts_tpu.gguf import GGUFReader
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c.gguf")
        write_synthetic_codec(path, n_codes=64, seed=3)
        with GGUFReader(path) as r:
            from miotts_tpu.models.codec import load_codec_params
            params, cfg = load_codec_params(r)
    codes = [1, 5, 9, 13, 17, 21, 25, 29]
    emb = np.linspace(-0.5, 0.5, cfg.adaln_dim).astype(np.float32)
    stages, _ = codec_decode_stages(params, codes, emb, cfg)
    golden = np.load(golden_path)
    assert set(golden.files) == set(stages.keys())
    for name in golden.files:
        np.testing.assert_allclose(stages[name], golden[name], atol=1e-5,
                                   err_msg=f"stage {name} diverged from golden")


def test_fast_mode_matches_exact_on_cpu(tiny_codec, rng):
    """CodecConfig.fast selects bf16-input matmul precision at trace time.
    On the CPU backend both precisions compute identical f32 math, so this
    validates the plumbing (separate jit keys, no cross-contamination when
    both modes run interleaved in one process); the ~1e-3 TPU error bound
    is measured by the serving bench."""
    import dataclasses
    params, cfg = tiny_codec
    cfg_fast = dataclasses.replace(cfg, fast=True)
    T = 6
    codes = jnp.asarray(rng.integers(0, 64, T), jnp.int32)
    emb = jnp.asarray(rng.standard_normal(cfg.adaln_dim), jnp.float32)
    a_exact1 = np.asarray(codec_decode_audio(params, codes, emb, cfg))
    a_fast = np.asarray(codec_decode_audio(params, codes, emb, cfg_fast))
    # interleave: exact again AFTER a fast trace must still be exact
    a_exact2 = np.asarray(codec_decode_audio(params, codes, emb, cfg))
    np.testing.assert_array_equal(a_exact1, a_exact2)
    np.testing.assert_allclose(a_fast, a_exact1, rtol=1e-5, atol=1e-5)

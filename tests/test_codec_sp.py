"""Sequence-parallel codec decode: exact parity with single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models.codec import codec_decode_audio, load_codec_params
from miotts_tpu.models.codec_sp import codec_decode_audio_sp
from miotts_tpu.models.synthetic import write_synthetic_codec
from miotts_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def codec(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spc") / "codec.gguf")
    write_synthetic_codec(path, n_codes=64, seed=3)
    with GGUFReader(path) as r:
        return load_codec_params(r)


def test_sp_matches_single_device(codec, rng):
    params, cfg = codec
    mesh = make_mesh(data=2, model=4)
    T = 32  # 8 codes/device, window 9 -> halo 4 ok
    codes = jnp.asarray(rng.integers(0, 64, T), jnp.int32)
    emb = jnp.asarray(rng.standard_normal(cfg.adaln_dim) * 0.3, jnp.float32)

    want = np.asarray(codec_decode_audio(params, codes, emb, cfg))
    got = np.asarray(codec_decode_audio_sp(params, codes, emb, cfg, mesh))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sp_with_padding_mask(codec, rng):
    """Bucketed SP decode (n_real < T) matches single-device bucketed."""
    params, cfg = codec
    mesh = make_mesh(data=2, model=4)
    T, real = 32, 27
    codes = jnp.asarray(rng.integers(0, 64, T), jnp.int32)
    emb = jnp.asarray(rng.standard_normal(cfg.adaln_dim) * 0.3, jnp.float32)
    nr = jnp.asarray(real, jnp.int32)

    want = np.asarray(codec_decode_audio(params, codes, emb, cfg, n_real=nr))
    got = np.asarray(codec_decode_audio_sp(params, codes, emb, cfg, mesh,
                                           n_real=nr))
    n = real * cfg.samples_per_token
    np.testing.assert_allclose(got[:n], want[:n], atol=2e-4)


def test_sp_eight_devices(codec, rng):
    params, cfg = codec
    mesh = make_mesh(data=1, model=8)
    T = 64
    codes = jnp.asarray(rng.integers(0, 64, T), jnp.int32)
    emb = jnp.asarray(rng.standard_normal(cfg.adaln_dim) * 0.3, jnp.float32)
    want = np.asarray(codec_decode_audio(params, codes, emb, cfg))
    got = np.asarray(codec_decode_audio_sp(params, codes, emb, cfg, mesh))
    np.testing.assert_allclose(got, want, atol=2e-4)

"""Property/fuzz tests: random configurations through the parity checks.

Catches latent shape/masking bugs outside the fixed test configs — the
codec fuzz runs the full numpy cross-implementation check per config, the
LLM fuzz runs prefill/decode-consistency (the strongest internal invariant).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models.codec import CodecConfig, codec_decode_spec, load_codec_params
from miotts_tpu.models.llm import (
    LLMConfig, init_kv_cache, llm_decode_step, llm_forward, llm_prefill,
    load_llm_params,
)
from miotts_tpu.models.synthetic import write_synthetic_codec, write_synthetic_llm

import ref_codec


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 23, 37])
def test_codec_fuzz_configs(tmp_path, seed):
    """Random codec hyperparameters: JAX == numpy cross-implementation."""
    r = np.random.default_rng(seed)
    heads = int(r.choice([2, 4]))
    dim = int(heads * r.choice([8, 16]))
    dec_heads = int(r.choice([2, 4]))
    dec_dim = int(dec_heads * r.choice([8, 16]))
    groups = int(r.choice([2, 4]))
    factor = int(r.choice([2, 3]))
    kernel = factor + 2 * int(r.choice([1, 2]))
    cfg = CodecConfig(
        prenet_layers=int(r.choice([1, 2])), prenet_dim=dim,
        prenet_heads=heads, prenet_ff=dim * 2,
        prenet_window=int(r.choice([5, 9, 13])),
        decoder_layers=int(r.choice([1, 2])), decoder_dim=dec_dim,
        decoder_heads=dec_heads, decoder_ff=dec_dim * 2,
        decoder_window=int(r.choice([5, 9])),
        adaln_dim=int(r.choice([8, 16])),
        resnet_blocks=int(r.choice([1, 2])), resnet_groups=groups,
        upsampler_stages=2, up_factors=(factor, factor),
        up_kernels=(kernel, kernel),
        samples_per_token=2 * factor * factor * 98,
    )
    path = str(tmp_path / f"fz{seed}.gguf")
    write_synthetic_codec(path, cfg=cfg, n_codes=32, seed=seed,
                          up_channels=(max(groups * 2, dec_dim // 2),
                                       max(groups * 2, dec_dim // 4)))
    with GGUFReader(path) as rd:
        params, cfg2 = load_codec_params(rd)
    T = int(r.integers(3, 7))
    codes = r.integers(0, 32, T)
    emb = (r.standard_normal(cfg.adaln_dim) * 0.4).astype(np.float32)
    got_lm, got_ph = codec_decode_spec(
        params, jnp.asarray(codes, jnp.int32), jnp.asarray(emb), cfg2)
    want_lm, want_ph = ref_codec.ref_codec_spec(params, codes, emb, cfg2)
    np.testing.assert_allclose(np.asarray(got_lm), want_lm, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_ph), want_ph, atol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [5, 17])
def test_llm_fuzz_configs(tmp_path, seed):
    """Random LLM shapes/arches: step-by-step decode == full prefill."""
    r = np.random.default_rng(seed)
    arch = str(r.choice(["qwen2", "qwen3", "llama"]))
    heads = int(r.choice([2, 4]))
    kv = int(r.choice([1, 2]))
    hd = int(r.choice([8, 16]))
    from miotts_tpu.models.llm import _ARCH_TABLE
    cfg0 = LLMConfig(arch=arch, n_layers=int(r.choice([1, 3])),
                     dim=heads * hd, n_heads=heads, n_kv_heads=kv,
                     head_dim=hd, ff_dim=int(r.choice([32, 96])),
                     n_vocab=256 + 3 + 8, n_ctx=64, **_ARCH_TABLE[arch])
    path = str(tmp_path / f"lfz{seed}.gguf")
    write_synthetic_llm(path, cfg=cfg0, seed=seed)
    with GGUFReader(path) as rd:
        cfg = LLMConfig.from_gguf(rd)
        params, _ = load_llm_params(rd, cfg, dtype=jnp.float32)
    B, n0, n1 = 2, 3, 7
    toks = r.integers(0, cfg.n_vocab, (B, n1)).astype(np.int32)
    pos = jnp.broadcast_to(jnp.arange(n1), (B, n1))
    full, _ = llm_forward(params, jnp.asarray(toks), pos,
                          init_kv_cache(cfg, B, 16, dtype=jnp.float32), cfg)
    cache = init_kv_cache(cfg, B, 16, dtype=jnp.float32)
    last, cache = llm_prefill(params, jnp.asarray(toks[:, :n0]),
                              jnp.full((B,), n0, jnp.int32), cache, cfg)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, n0 - 1]),
                               rtol=2e-4, atol=2e-4)
    for j in range(n0, n1):
        step, cache = llm_decode_step(params, jnp.asarray(toks[:, j]), cache, cfg)
        np.testing.assert_allclose(np.asarray(step), np.asarray(full[:, j]),
                                   rtol=2e-4, atol=2e-4)

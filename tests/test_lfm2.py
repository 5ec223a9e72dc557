"""LFM2 hybrid (attention + gated short-conv) architecture tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miotts_tpu.gguf import GGUFReader, GGML_F32, GGML_Q8_0
from miotts_tpu.models.llm import (
    LLMConfig, init_kv_cache, llm_decode_step, llm_forward, llm_prefill,
    load_llm_params,
)
from miotts_tpu.models.synthetic import write_synthetic_llm

_LAYER_TYPES = ("conv", "attn", "conv", "attn")


def _lfm2_cfg(n_vocab=256 + 3 + 16):
    return LLMConfig(arch="lfm2", n_layers=4, dim=64, n_heads=4,
                     n_kv_heads=2, head_dim=16, ff_dim=96, n_vocab=n_vocab,
                     n_ctx=128, rope_style="neox", qkv_bias=False,
                     qk_norm=True, layer_types=_LAYER_TYPES, conv_l_cache=3)


def _build(tmp_path, quant=GGML_F32, weights=None, n_vocab=256 + 3 + 16):
    path = str(tmp_path / f"lfm2_{quant}.gguf")
    cfg0 = _lfm2_cfg(n_vocab)
    write_synthetic_llm(path, cfg=cfg0, quant_type=quant, seed=4,
                        weights=weights)
    with GGUFReader(path) as r:
        cfg = LLMConfig.from_gguf(r)
        assert cfg.layer_types == _LAYER_TYPES
        assert cfg.conv_l_cache == 3
        params, _ = load_llm_params(r, cfg, dtype=jnp.float32)
    return params, cfg


def test_hybrid_cache_shapes(tmp_path):
    params, cfg = _build(tmp_path)
    cache = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    assert cache["k"].shape[0] == 2      # attention layers only
    assert cache["conv"].shape == (2, 2, 2, 64)   # [n_conv, B, L-1, dim]


def test_lfm2_prefill_decode_consistency(tmp_path, rng):
    """Step-by-step decode must reproduce full-prefill logits — validates
    the conv state ring alongside the KV cache."""
    params, cfg = _build(tmp_path)
    B, n0, n1 = 2, 5, 9
    toks = rng.integers(0, cfg.n_vocab, (B, n1)).astype(np.int32)

    cache_a = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(n1), (B, n1))
    logits_full, _ = llm_forward(params, jnp.asarray(toks), pos, cache_a, cfg)

    cache = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    last, cache = llm_prefill(params, jnp.asarray(toks[:, :n0]),
                              jnp.full((B,), n0, jnp.int32), cache, cfg)
    np.testing.assert_allclose(np.asarray(last),
                               np.asarray(logits_full[:, n0 - 1]),
                               rtol=1e-4, atol=1e-4)
    for j in range(n0, n1):
        step_logits, cache = llm_decode_step(
            params, jnp.asarray(toks[:, j]), cache, cfg)
        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(logits_full[:, j]),
                                   rtol=1e-4, atol=1e-4)


def test_lfm2_padded_prefill(tmp_path, rng):
    """Right-padded prefill must leave the conv state equal to the unpadded
    one (state slicing by `advance`)."""
    params, cfg = _build(tmp_path)
    B, n, bucket = 2, 5, 12
    toks = rng.integers(0, cfg.n_vocab, (B, n)).astype(np.int32)
    padded = np.zeros((B, bucket), np.int32)
    padded[:, :n] = toks

    c1 = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    last1, c1 = llm_prefill(params, jnp.asarray(toks),
                            jnp.full((B,), n, jnp.int32), c1, cfg)
    c2 = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    last2, c2 = llm_prefill(params, jnp.asarray(padded),
                            jnp.full((B,), n, jnp.int32), c2, cfg)
    np.testing.assert_allclose(np.asarray(last1), np.asarray(last2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c1["conv"]), np.asarray(c2["conv"]),
                               rtol=1e-5, atol=1e-5)
    nt = rng.integers(0, cfg.n_vocab, B).astype(np.int32)
    s1, _ = llm_decode_step(params, jnp.asarray(nt), c1, cfg)
    s2, _ = llm_decode_step(params, jnp.asarray(nt), c2, cfg)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-4)


def test_lfm2_q8_0(tmp_path, rng):
    params, cfg = _build(tmp_path, quant=GGML_Q8_0)
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 6)), jnp.int32)
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    last, cache = llm_prefill(params, toks, jnp.asarray([6], jnp.int32),
                              cache, cfg)
    assert np.isfinite(np.asarray(last)).all()


@pytest.mark.slow
def test_hf_lfm2_parity(tmp_path, rng):
    """Authoritative LFM2 semantics: match HuggingFace Lfm2ForCausalLM on
    identical weights (hybrid conv/attention, q/k per-head RMS norms)."""
    torch = pytest.importorskip("torch")
    from transformers import Lfm2Config, Lfm2ForCausalLM

    n_vocab = 256 + 3 + 16
    hf_cfg = Lfm2Config(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, norm_eps=1e-6, rope_theta=10000.0,
        conv_L_cache=3, conv_bias=False, tie_word_embeddings=False,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        block_auto_adjust_ff_dim=False,
    )
    torch.manual_seed(0)
    model = Lfm2ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    weights = {
        "token_embd.weight": sd["model.embed_tokens.weight"],
        "output_norm.weight": sd["model.embedding_norm.weight"],
    }
    if "lm_head.weight" in sd:
        weights["output.weight"] = sd["lm_head.weight"]
    for i, kind in enumerate(_LAYER_TYPES):
        h = f"model.layers.{i}."
        g = f"blk.{i}."
        weights[g + "attn_norm.weight"] = sd[h + "operator_norm.weight"]
        weights[g + "ffn_norm.weight"] = sd[h + "ffn_norm.weight"]
        weights[g + "ffn_gate.weight"] = sd[h + "feed_forward.w1.weight"]
        weights[g + "ffn_down.weight"] = sd[h + "feed_forward.w2.weight"]
        weights[g + "ffn_up.weight"] = sd[h + "feed_forward.w3.weight"]
        if kind == "attn":
            weights[g + "attn_q.weight"] = sd[h + "self_attn.q_proj.weight"]
            weights[g + "attn_k.weight"] = sd[h + "self_attn.k_proj.weight"]
            weights[g + "attn_v.weight"] = sd[h + "self_attn.v_proj.weight"]
            weights[g + "attn_output.weight"] = sd[h + "self_attn.out_proj.weight"]
            weights[g + "attn_q_norm.weight"] = sd[h + "self_attn.q_layernorm.weight"]
            weights[g + "attn_k_norm.weight"] = sd[h + "self_attn.k_layernorm.weight"]
        else:
            # torch depthwise Conv1d weight [dim, 1, L] -> [dim, L]
            weights[g + "shortconv.conv.weight"] = sd[h + "conv.conv.weight"][:, 0, :]
            weights[g + "shortconv.in_proj.weight"] = sd[h + "conv.in_proj.weight"]
            weights[g + "shortconv.out_proj.weight"] = sd[h + "conv.out_proj.weight"]

    params, cfg = _build(tmp_path, weights=weights, n_vocab=n_vocab)

    toks = rng.integers(0, n_vocab, (1, 7)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()

    pos = jnp.broadcast_to(jnp.arange(7), (1, 7))
    ours, _ = llm_forward(params, jnp.asarray(toks, jnp.int32), pos,
                          init_kv_cache(cfg, 1, 16, dtype=jnp.float32), cfg)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-3, atol=2e-3)


def test_lfm2_engine_end_to_end(tmp_path, rng):
    """Full TTS engine run on an LFM2-architecture LLM."""
    from miotts_tpu.gguf import write_voice_embedding
    from miotts_tpu.models.synthetic import write_synthetic_codec
    from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine, VoiceModel

    llm_path = str(tmp_path / "lfm2.gguf")
    cfg0 = _lfm2_cfg(256 + 3 + 64)
    write_synthetic_llm(llm_path, cfg=cfg0, seed=9)
    codec_path = str(tmp_path / "codec.gguf")
    ccfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    emb_path = str(tmp_path / "v.emb.gguf")
    write_voice_embedding(emb_path, rng.standard_normal(ccfg.adaln_dim) * 0.3)

    eng = TTSEngine(EngineConfig(model_path=llm_path, codec_path=codec_path,
                                 max_tokens=40, llm_dtype="float32",
                                 prompt_bucket=32, code_bucket=16))
    ids = eng.generate_tokens("hello lfm2", Options(max_tokens=30, seed=42))
    assert len(ids) <= 30
    ids2 = eng.generate_tokens("hello lfm2", Options(max_tokens=30, seed=42))
    assert ids == ids2


def test_lfm2_continuous_batching(tmp_path, rng):
    """Hybrid arch through the batcher: per-slot conv states slice/update
    correctly alongside the KV cache."""
    from miotts_tpu.gguf import write_voice_embedding
    from miotts_tpu.models.synthetic import write_synthetic_codec
    from miotts_tpu.runtime.batching import ContinuousBatcher
    from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine, VoiceModel

    llm_path = str(tmp_path / "lfm2b.gguf")
    write_synthetic_llm(llm_path, cfg=_lfm2_cfg(256 + 3 + 64), seed=9)
    codec_path = str(tmp_path / "codec.gguf")
    ccfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    emb_path = str(tmp_path / "v.emb.gguf")
    write_voice_embedding(emb_path, rng.standard_normal(ccfg.adaln_dim) * 0.3)

    eng = TTSEngine(EngineConfig(model_path=llm_path, codec_path=codec_path,
                                 max_tokens=30, llm_dtype="float32",
                                 prompt_bucket=32, code_bucket=16))
    voice = VoiceModel(emb_path)
    batcher = ContinuousBatcher(eng, n_slots=2, chunk_steps=10)
    assert "conv" in batcher.cache
    done = []
    for i in range(3):
        batcher.submit(f"lfm2 {i}", voice,
                       lambda s, sr, last, i=i: (done.append(i) if last else None) or True,
                       Options(max_tokens=20, temperature=1.0))
    batcher.run_until_done(max_iters=100)
    assert batcher.pending == 0


def test_lfm2_fused_streaming(tmp_path, rng):
    """Fused streaming step over the hybrid (conv+attn) architecture."""
    from miotts_tpu.gguf import write_voice_embedding
    from miotts_tpu.models.synthetic import write_synthetic_codec
    from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine, VoiceModel

    llm_path = str(tmp_path / "lfm2s.gguf")
    write_synthetic_llm(llm_path, cfg=_lfm2_cfg(256 + 3 + 64), seed=9)
    codec_path = str(tmp_path / "codec.gguf")
    ccfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    emb_path = str(tmp_path / "v.emb.gguf")
    write_voice_embedding(emb_path, rng.standard_normal(ccfg.adaln_dim) * 0.3)

    eng = TTSEngine(EngineConfig(model_path=llm_path, codec_path=codec_path,
                                 max_tokens=60, llm_dtype="float32",
                                 prompt_bucket=32, code_bucket=16))
    assert eng.config.fused_streaming
    voice = VoiceModel(emb_path)
    chunks = []
    ok = eng.synthesize_stream(
        voice, "lfm2 stream", lambda s, sr, last: (chunks.append(s) if s is not None else None) or True,
        options=Options(max_tokens=60, temperature=1.0, seed=3))
    assert ok or not chunks


def test_lfm2_generate_chunk_batched_matches_stepwise(tmp_path, rng):
    """The unified chunk-buffered batched generator must reproduce greedy
    stepwise decode for hybrid models too: attention layers ride the chunk
    buffer, the gated short-conv state rides the loop carry."""
    from miotts_tpu.models.llm import llm_generate_chunk_batched
    params, cfg = _build(tmp_path)
    B, ctx, W = 3, 64, 6
    toks = rng.integers(0, cfg.n_vocab, (B, 8)).astype(np.int32)
    n_real = jnp.asarray([5, 8, 3], jnp.int32)

    def fresh():
        cache = init_kv_cache(cfg, B, ctx, dtype=jnp.float32)
        return llm_prefill(params, jnp.asarray(toks), n_real, cache, cfg)

    last_ref, cache_ref = fresh()
    ref_toks = []
    for _ in range(W):
        t = jnp.argmax(last_ref, -1).astype(jnp.int32)
        ref_toks.append(np.asarray(t))
        last_ref, cache_ref = llm_decode_step(params, t, cache_ref, cfg)
    ref_toks = np.stack(ref_toks, 1)

    last0, cache0 = fresh()
    buf, active, last, cache, _ = llm_generate_chunk_batched(
        params, last0, cache0, jnp.asarray([True] * B),
        jax.random.PRNGKey(0), jnp.float32(0.0),
        jnp.asarray([-7], jnp.int32), cfg, W)
    np.testing.assert_array_equal(np.asarray(buf), ref_toks)
    np.testing.assert_allclose(np.asarray(last), np.asarray(last_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cache["fill"]),
                                  np.asarray(n_real) + W)
    np.testing.assert_allclose(np.asarray(cache["conv"]),
                               np.asarray(cache_ref["conv"]),
                               rtol=2e-4, atol=2e-4)
    kr, kb = np.asarray(cache_ref["k"]), np.asarray(cache["k"])
    for b in range(B):
        f = int(n_real[b]) + W
        np.testing.assert_allclose(kb[:, b, :, :f], kr[:, b, :, :f],
                                   rtol=2e-4, atol=2e-4)

    # attn_len bucket parity on the hybrid path
    last0, cache0 = fresh()
    buf2, _, _, cache2, _ = llm_generate_chunk_batched(
        params, last0, cache0, jnp.asarray([True] * B),
        jax.random.PRNGKey(0), jnp.float32(0.0),
        jnp.asarray([-7], jnp.int32), cfg, W, 32)
    np.testing.assert_array_equal(np.asarray(buf2), ref_toks)
    np.testing.assert_allclose(np.asarray(cache2["conv"]),
                               np.asarray(cache_ref["conv"]),
                               rtol=2e-4, atol=2e-4)

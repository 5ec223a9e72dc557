"""LLM decode engine tests: prefill/decode consistency, quantized weights,
HF-transformers parity (the authoritative qwen2 semantics check)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miotts_tpu.gguf import GGUFReader, GGML_F32, GGML_Q8_0
from miotts_tpu.models.llm import (
    LLMConfig, init_kv_cache, llm_decode_step, llm_forward, llm_prefill,
    load_llm_params, sample_token,
)
from miotts_tpu.models.synthetic import (
    synthetic_llm_config, write_synthetic_llm,
)
from miotts_tpu.text.tokenizer import Tokenizer


def _build(tmp_path, quant=GGML_F32, arch="qwen2", seed=0, weights=None,
           cfg=None):
    path = str(tmp_path / f"llm_{arch}_{quant}.gguf")
    cfg = write_synthetic_llm(path, cfg=cfg, quant_type=quant, seed=seed,
                              weights=weights)
    reader = GGUFReader(path)
    cfg2 = LLMConfig.from_gguf(reader)
    params, _ = load_llm_params(reader, cfg2, dtype=jnp.float32)
    return params, cfg2, reader


def test_config_from_gguf(tmp_path):
    params, cfg, r = _build(tmp_path)
    assert cfg.arch == "qwen2"
    assert cfg.n_layers == 2 and cfg.n_heads == 4 and cfg.n_kv_heads == 2
    assert cfg.qkv_bias and not cfg.qk_norm and cfg.rope_style == "neox"
    assert cfg.n_vocab == 256 + 3 + 64
    r.close()


def test_prefill_decode_consistency(tmp_path, rng):
    """Prefill(t[:n]) then step-by-step decode of t[n:] must reproduce the
    logits of a longer prefill — validates cache writes, positions, and
    causal masking."""
    params, cfg, r = _build(tmp_path)
    r.close()
    B, n0, n1 = 2, 5, 8
    toks = rng.integers(0, cfg.n_vocab, (B, n1)).astype(np.int32)

    # ground truth: full forward, no padding
    cache_a = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(n1), (B, n1))
    logits_full, _ = llm_forward(params, jnp.asarray(toks), pos, cache_a, cfg)

    # prefill n0 then decode one by one
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


def test_prefill_bucket_padding(tmp_path, rng):
    """Right-padded prefill with n_real must match unpadded prefill."""
    params, cfg, r = _build(tmp_path)
    r.close()
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
    # subsequent decode identical too (padding keys masked by fill)
    nt = rng.integers(0, cfg.n_vocab, B).astype(np.int32)
    s1, _ = llm_decode_step(params, jnp.asarray(nt), c1, cfg)
    s2, _ = llm_decode_step(params, jnp.asarray(nt), c2, cfg)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-4)


def test_q8_0_matches_f32_closely(tmp_path, rng):
    """Same seed quantized Q8_0 vs F32: logits close (8-bit noise only)."""
    p32, cfg, r1 = _build(tmp_path, GGML_F32, seed=7)
    pq, _, r2 = _build(tmp_path, GGML_Q8_0, seed=7)
    r1.close(); r2.close()
    B, S = 1, 6
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, S)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    la, _ = llm_forward(p32, toks, pos, init_kv_cache(cfg, B, 16, dtype=jnp.float32), cfg)
    lb, _ = llm_forward(pq, toks, pos, init_kv_cache(cfg, B, 16, dtype=jnp.float32), cfg)
    a, b = np.asarray(la), np.asarray(lb)
    denom = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / denom < 0.05


def test_greedy_generation_deterministic(tmp_path, rng):
    params, cfg, r = _build(tmp_path)
    r.close()
    B = 1
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, 4)), jnp.int32)
    outs = []
    for _ in range(2):
        cache = init_kv_cache(cfg, B, 64, dtype=jnp.float32)
        last, cache = llm_prefill(params, toks, jnp.full((B,), 4, jnp.int32),
                                  cache, cfg)
        seq = []
        key = jax.random.PRNGKey(42)
        for _ in range(8):
            t = sample_token(last, jnp.float32(0.0), key)
            seq.append(int(t[0]))
            last, cache = llm_decode_step(params, t, cache, cfg)
        outs.append(seq)
    assert outs[0] == outs[1]


def test_decoupled_head_dim(tmp_path, rng):
    """n_heads * head_dim != dim (qwen3-style 0.6B/1.7B: hidden 1024/2048
    with 16 heads of 128): projections are sized H*D, attn_output maps
    H*D -> dim.  Prefill + stepwise decode must match a full forward."""
    from miotts_tpu.models.llm import _ARCH_TABLE
    cfg0 = LLMConfig(arch="qwen2", n_layers=2, dim=64, n_heads=4,
                     n_kv_heads=2, head_dim=32, ff_dim=128,
                     n_vocab=256 + 3 + 64, n_ctx=256,
                     **_ARCH_TABLE["qwen2"])
    params, cfg, r = _build(tmp_path, cfg=cfg0)
    r.close()
    assert cfg.head_dim == 32 and cfg.n_heads * cfg.head_dim != cfg.dim
    B, n1 = 1, 6
    toks = rng.integers(0, cfg.n_vocab, (B, n1)).astype(np.int32)
    pos = jnp.broadcast_to(jnp.arange(n1), (B, n1))
    logits_full, _ = llm_forward(params, jnp.asarray(toks), pos,
                                 init_kv_cache(cfg, B, 32, dtype=jnp.float32),
                                 cfg)
    cache = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    last, cache = llm_prefill(params, jnp.asarray(toks[:, :4]),
                              jnp.full((B,), 4, jnp.int32), cache, cfg)
    for i in range(4, n1):
        last, cache = llm_decode_step(params, jnp.asarray(toks[:, i]),
                                      cache, cfg)
    np.testing.assert_allclose(np.asarray(last),
                               np.asarray(logits_full[:, -1]),
                               rtol=1e-4, atol=1e-4)


def test_sampling_seeded_reproducible(tmp_path, rng):
    logits = jnp.asarray(rng.standard_normal((2, 50)), jnp.float32)
    k = jax.random.PRNGKey(42)
    a = sample_token(logits, jnp.float32(0.8), k)
    b = sample_token(logits, jnp.float32(0.8), k)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # greedy picks argmax
    g = sample_token(logits, jnp.float32(0.0), k)
    np.testing.assert_array_equal(np.asarray(g), np.argmax(np.asarray(logits), -1))


def test_qwen3_qk_norm_path(tmp_path, rng):
    cfg0 = synthetic_llm_config(arch="qwen3")
    params, cfg, r = _build(tmp_path, arch="qwen3", cfg=cfg0)
    r.close()
    assert cfg.qk_norm and not cfg.qkv_bias
    B, S = 1, 4
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, S)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    logits, _ = llm_forward(params, toks, pos,
                            init_kv_cache(cfg, B, 16, dtype=jnp.float32), cfg)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_hf_qwen2_parity(tmp_path, rng):
    """Authoritative semantics check: our qwen2 forward must match
    HuggingFace transformers' Qwen2 (which llama.cpp matches) on identical
    weights."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    n_speech = 16
    n_vocab = 256 + 3 + n_speech
    hf_cfg = Qwen2Config(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    weights = {
        "token_embd.weight": sd["model.embed_tokens.weight"],
        "output_norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(2):
        h = f"model.layers.{i}."
        g = f"blk.{i}."
        weights[g + "attn_norm.weight"] = sd[h + "input_layernorm.weight"]
        weights[g + "attn_q.weight"] = sd[h + "self_attn.q_proj.weight"]
        weights[g + "attn_q.bias"] = sd[h + "self_attn.q_proj.bias"]
        weights[g + "attn_k.weight"] = sd[h + "self_attn.k_proj.weight"]
        weights[g + "attn_k.bias"] = sd[h + "self_attn.k_proj.bias"]
        weights[g + "attn_v.weight"] = sd[h + "self_attn.v_proj.weight"]
        weights[g + "attn_v.bias"] = sd[h + "self_attn.v_proj.bias"]
        weights[g + "attn_output.weight"] = sd[h + "self_attn.o_proj.weight"]
        weights[g + "ffn_norm.weight"] = sd[h + "post_attention_layernorm.weight"]
        weights[g + "ffn_gate.weight"] = sd[h + "mlp.gate_proj.weight"]
        weights[g + "ffn_up.weight"] = sd[h + "mlp.up_proj.weight"]
        weights[g + "ffn_down.weight"] = sd[h + "mlp.down_proj.weight"]

    cfg0 = synthetic_llm_config(n_speech=n_speech)
    params, cfg, r = _build(tmp_path, GGML_F32, weights=weights, cfg=cfg0)
    r.close()

    toks = rng.integers(0, n_vocab, (1, 7)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()

    pos = jnp.broadcast_to(jnp.arange(7), (1, 7))
    ours, _ = llm_forward(params, jnp.asarray(toks, jnp.int32), pos,
                          init_kv_cache(cfg, 1, 16, dtype=jnp.float32), cfg)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-3, atol=2e-3)


def test_int8_kv_cache_matches_f32(tmp_path, rng):
    """int8-quantized KV cache: decode logits stay close to the f32 cache
    (north-star extension; the reference always uses f16 KV)."""
    params, cfg, r = _build(tmp_path)
    r.close()
    B, n = 2, 6
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, n)), jnp.int32)
    nr = jnp.full((B,), n, jnp.int32)

    c_f = init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    last_f, c_f = llm_prefill(params, toks, nr, c_f, cfg)
    c_q = init_kv_cache(cfg, B, 32, quantized=True)
    assert c_q["k"].dtype == jnp.int8
    last_q, c_q = llm_prefill(params, toks, nr, c_q, cfg)

    a, b = np.asarray(last_f), np.asarray(last_q)
    denom = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / denom < 0.02

    nt = jnp.asarray(rng.integers(0, cfg.n_vocab, B), jnp.int32)
    s_f, _ = llm_decode_step(params, nt, c_f, cfg)
    s_q, _ = llm_decode_step(params, nt, c_q, cfg)
    a, b = np.asarray(s_f), np.asarray(s_q)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-6) < 0.02


@pytest.mark.slow
def test_hf_qwen3_parity(tmp_path, rng):
    """Qwen3 semantics (per-head QK RMS norms, no biases) vs HF."""
    torch = pytest.importorskip("torch")
    try:
        from transformers import Qwen3Config, Qwen3ForCausalLM
    except ImportError:
        pytest.skip("transformers lacks Qwen3")

    n_vocab = 256 + 3 + 16
    hf_cfg = Qwen3Config(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False, attention_dropout=0.0,
    )
    torch.manual_seed(1)
    model = Qwen3ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    weights = {
        "token_embd.weight": sd["model.embed_tokens.weight"],
        "output_norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(2):
        h = f"model.layers.{i}."
        g = f"blk.{i}."
        weights[g + "attn_norm.weight"] = sd[h + "input_layernorm.weight"]
        weights[g + "attn_q.weight"] = sd[h + "self_attn.q_proj.weight"]
        weights[g + "attn_k.weight"] = sd[h + "self_attn.k_proj.weight"]
        weights[g + "attn_v.weight"] = sd[h + "self_attn.v_proj.weight"]
        weights[g + "attn_output.weight"] = sd[h + "self_attn.o_proj.weight"]
        weights[g + "attn_q_norm.weight"] = sd[h + "self_attn.q_norm.weight"]
        weights[g + "attn_k_norm.weight"] = sd[h + "self_attn.k_norm.weight"]
        weights[g + "ffn_norm.weight"] = sd[h + "post_attention_layernorm.weight"]
        weights[g + "ffn_gate.weight"] = sd[h + "mlp.gate_proj.weight"]
        weights[g + "ffn_up.weight"] = sd[h + "mlp.up_proj.weight"]
        weights[g + "ffn_down.weight"] = sd[h + "mlp.down_proj.weight"]

    cfg0 = synthetic_llm_config(n_speech=16, arch="qwen3")
    params, cfg, r = _build(tmp_path, GGML_F32, weights=weights, cfg=cfg0,
                            arch="qwen3")
    r.close()

    toks = rng.integers(0, n_vocab, (1, 7)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()
    pos = jnp.broadcast_to(jnp.arange(7), (1, 7))
    ours, _ = llm_forward(params, jnp.asarray(toks, jnp.int32), pos,
                          init_kv_cache(cfg, 1, 16, dtype=jnp.float32), cfg)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_hf_llama_parity(tmp_path, rng):
    """llama arch uses interleaved ('norm') RoPE on GGUF weights that the
    converter PERMUTES from HF's half-split layout
    (convert_hf_to_gguf permute); applying the same permutation here must
    reproduce HF logits."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    n_vocab = 256 + 3 + 16
    hf_cfg = LlamaConfig(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_dropout=0.0, attention_bias=False,
    )
    torch.manual_seed(2)
    model = LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    def permute(w, n_head):
        # llama.cpp convert_hf_to_gguf: half-split -> interleaved rope layout
        s = w.shape
        return (w.reshape(n_head, 2, s[0] // n_head // 2, *s[1:])
                 .swapaxes(1, 2).reshape(s))

    weights = {
        "token_embd.weight": sd["model.embed_tokens.weight"],
        "output_norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(2):
        h = f"model.layers.{i}."
        g = f"blk.{i}."
        weights[g + "attn_norm.weight"] = sd[h + "input_layernorm.weight"]
        weights[g + "attn_q.weight"] = permute(sd[h + "self_attn.q_proj.weight"], 4)
        weights[g + "attn_k.weight"] = permute(sd[h + "self_attn.k_proj.weight"], 2)
        weights[g + "attn_v.weight"] = sd[h + "self_attn.v_proj.weight"]
        weights[g + "attn_output.weight"] = sd[h + "self_attn.o_proj.weight"]
        weights[g + "ffn_norm.weight"] = sd[h + "post_attention_layernorm.weight"]
        weights[g + "ffn_gate.weight"] = sd[h + "mlp.gate_proj.weight"]
        weights[g + "ffn_up.weight"] = sd[h + "mlp.up_proj.weight"]
        weights[g + "ffn_down.weight"] = sd[h + "mlp.down_proj.weight"]

    cfg0 = synthetic_llm_config(n_speech=16, arch="llama")
    params, cfg, r = _build(tmp_path, GGML_F32, weights=weights, cfg=cfg0,
                            arch="llama")
    r.close()
    assert cfg.rope_style == "norm"

    toks = rng.integers(0, n_vocab, (1, 7)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()
    pos = jnp.broadcast_to(jnp.arange(7), (1, 7))
    ours, _ = llm_forward(params, jnp.asarray(toks, jnp.int32), pos,
                          init_kv_cache(cfg, 1, 16, dtype=jnp.float32), cfg)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-3, atol=2e-3)


def test_filtered_sampling(rng):
    from miotts_tpu.models.llm import sample_token_filtered
    logits = jnp.asarray(rng.standard_normal((2, 100)) * 3, jnp.float32)
    k = jax.random.PRNGKey(0)
    # top-k=1 == greedy regardless of temperature
    t = sample_token_filtered(logits, jnp.float32(2.0), k, top_k=1)
    np.testing.assert_array_equal(np.asarray(t),
                                  np.argmax(np.asarray(logits), -1))
    # top-p tiny -> also argmax
    t = sample_token_filtered(logits, jnp.float32(2.0), k,
                              top_p=jnp.float32(1e-6))
    np.testing.assert_array_equal(np.asarray(t),
                                  np.argmax(np.asarray(logits), -1))
    # min_p=1.0 keeps only max-prob tokens
    t = sample_token_filtered(logits, jnp.float32(2.0), k,
                              min_p=jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(t),
                                  np.argmax(np.asarray(logits), -1))
    # top_k=50 at high temp: samples stay inside the top-50 set
    for trial in range(5):
        kk = jax.random.PRNGKey(trial)
        t = np.asarray(sample_token_filtered(logits, jnp.float32(5.0), kk,
                                             top_k=50))
        for b in range(2):
            topset = np.argsort(-np.asarray(logits)[b])[:50]
            assert t[b] in topset


def test_generate_chunk_batched_matches_stepwise(tmp_path, rng):
    """The chunk-buffered batched generator (read-only cache + per-chunk
    merge) must reproduce greedy stepwise decode: same tokens, same cache
    contents at every valid position, same fill; inactive slots untouched;
    a stop token freezes its slot mid-chunk."""
    from miotts_tpu.models.llm import llm_generate_chunk_batched
    params, cfg, r = _build(tmp_path)
    r.close()
    B, ctx, W = 3, 64, 6
    toks = rng.integers(0, cfg.n_vocab, (B, 8)).astype(np.int32)
    n_real = jnp.asarray([5, 8, 3], jnp.int32)

    def fresh():
        cache = init_kv_cache(cfg, B, ctx, dtype=jnp.float32)
        return llm_prefill(params, jnp.asarray(toks), n_real, cache, cfg)

    # --- stepwise greedy reference (all slots active, no stops) ---
    last_ref, cache_ref = fresh()
    ref_toks = []
    for _ in range(W):
        t = jnp.argmax(last_ref, -1).astype(jnp.int32)
        ref_toks.append(np.asarray(t))
        last_ref, cache_ref = llm_decode_step(params, t, cache_ref, cfg)
    ref_toks = np.stack(ref_toks, 1)                      # [B, W]

    last0, cache0 = fresh()
    buf, active, last, cache, _ = llm_generate_chunk_batched(
        params, last0, cache0, jnp.asarray([True] * B),
        jax.random.PRNGKey(0), jnp.float32(0.0),
        jnp.asarray([-7], jnp.int32), cfg, W)
    np.testing.assert_array_equal(np.asarray(buf), ref_toks)
    assert np.asarray(active).all()
    np.testing.assert_allclose(np.asarray(last), np.asarray(last_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cache["fill"]),
                                  np.asarray(n_real) + W)
    # cache parity at every valid position
    kr, kb = np.asarray(cache_ref["k"]), np.asarray(cache["k"])
    vr, vb = np.asarray(cache_ref["v"]), np.asarray(cache["v"])
    for b in range(B):
        f = int(n_real[b]) + W
        np.testing.assert_allclose(kb[:, b, :, :f], kr[:, b, :, :f],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(vb[:, b, :, :f], vr[:, b, :, :f],
                                   rtol=2e-4, atol=2e-4)

    # --- inactive slot stays untouched ---
    last0, cache0 = fresh()
    k_before = np.asarray(cache0["k"][:, 1])
    buf2, active2, _, cache2, _ = llm_generate_chunk_batched(
        params, last0, cache0, jnp.asarray([True, False, True]),
        jax.random.PRNGKey(0), jnp.float32(0.0),
        jnp.asarray([-7], jnp.int32), cfg, W)
    assert (np.asarray(buf2)[1] == -1).all()
    assert int(cache2["fill"][1]) == int(n_real[1])
    f1 = int(n_real[1])
    np.testing.assert_array_equal(np.asarray(cache2["k"][:, 1, :, :f1]),
                                  k_before[:, :, :f1])

    # --- stop token freezes a slot mid-chunk ---
    stop_tok = int(ref_toks[0, 2])                 # slot 0 emits it at step 2
    last0, cache0 = fresh()
    buf3, active3, _, cache3, _ = llm_generate_chunk_batched(
        params, last0, cache0, jnp.asarray([True] * B),
        jax.random.PRNGKey(0), jnp.float32(0.0),
        jnp.asarray([stop_tok], jnp.int32), cfg, W)
    b3 = np.asarray(buf3)
    assert not bool(np.asarray(active3)[0])
    assert (b3[0, 2:] == -1).all()                 # from the stop on: -1
    np.testing.assert_array_equal(b3[0, :2], ref_toks[0, :2])
    assert int(cache3["fill"][0]) == int(n_real[0]) + 2


def test_generate_chunk_batched_quantized_kv(tmp_path, rng):
    """Chunk-buffered generation over an int8 cache: within-chunk attention
    reads raw bf16 buffers (exact), the merge quantizes once.  Greedy
    tokens must match the f32-cache chunk path on a well-separated logit
    landscape."""
    from miotts_tpu.models.llm import llm_generate_chunk_batched
    params, cfg, r = _build(tmp_path)
    r.close()
    B, ctx, W = 2, 64, 5
    toks = rng.integers(0, cfg.n_vocab, (B, 6)).astype(np.int32)
    n_real = jnp.asarray([6, 4], jnp.int32)

    outs = {}
    for quant in (False, True):
        cache = init_kv_cache(cfg, B, ctx, dtype=jnp.float32,
                              quantized=quant)
        last, cache = llm_prefill(params, jnp.asarray(toks), n_real,
                                  cache, cfg)
        buf, _, _, cache, _ = llm_generate_chunk_batched(
            params, last, cache, jnp.asarray([True] * B),
            jax.random.PRNGKey(0), jnp.float32(0.0),
            jnp.asarray([-7], jnp.int32), cfg, W)
        outs[quant] = np.asarray(buf)
        np.testing.assert_array_equal(np.asarray(cache["fill"]),
                                      np.asarray(n_real) + W)
    np.testing.assert_array_equal(outs[False], outs[True])


def test_generate_chunk_batched_attn_len_bucket(tmp_path, rng):
    """attn_len slices the attention reads to the live context bucket; with
    every fill + n_steps <= attn_len the result must be identical to the
    full-cache chunk."""
    from miotts_tpu.models.llm import llm_generate_chunk_batched
    params, cfg, r = _build(tmp_path)
    r.close()
    B, ctx, W = 2, 128, 5
    toks = rng.integers(0, cfg.n_vocab, (B, 7)).astype(np.int32)
    n_real = jnp.asarray([7, 4], jnp.int32)

    outs = {}
    for attn_len in (0, 32):
        cache = init_kv_cache(cfg, B, ctx, dtype=jnp.float32)
        last, cache = llm_prefill(params, jnp.asarray(toks), n_real,
                                  cache, cfg)
        buf, _, last2, cache, _ = llm_generate_chunk_batched(
            params, last, cache, jnp.asarray([True] * B),
            jax.random.PRNGKey(0), jnp.float32(0.0),
            jnp.asarray([-7], jnp.int32), cfg, W, attn_len)
        outs[attn_len] = (np.asarray(buf), np.asarray(last2),
                          np.asarray(cache["k"]), np.asarray(cache["fill"]))
    np.testing.assert_array_equal(outs[0][0], outs[32][0])
    np.testing.assert_allclose(outs[0][1], outs[32][1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[0][2], outs[32][2], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(outs[0][3], outs[32][3])


def test_mixed_quant_fused_load_matches_unfused(tmp_path, rng):
    """Q4_K_M-style files mix Q4_K with Q6_K per layer (attn_v, ffn_down);
    load-time fusion must harmonize the formats and produce the same
    logits as the unfused load."""
    from miotts_tpu.gguf import GGML_Q4_K
    from miotts_tpu.models.llm import _ARCH_TABLE

    # K-quants need 256-elem super-blocks: every matmul in-dim % 256 == 0
    cfg = LLMConfig(arch="qwen2", n_layers=2, dim=256, n_heads=4,
                    n_kv_heads=2, head_dim=64, ff_dim=256,
                    n_vocab=256 + 3 + 64, n_ctx=256, **_ARCH_TABLE["qwen2"])
    path = str(tmp_path / "mixed.gguf")
    write_synthetic_llm(path, cfg=cfg, quant_type=GGML_Q4_K, seed=2,
                        mixed_k=True)
    with GGUFReader(path) as r:
        cfg = LLMConfig.from_gguf(r)
        fused, _ = load_llm_params(r, cfg, dtype=jnp.float32, fuse=True)
        plain, _ = load_llm_params(r, cfg, dtype=jnp.float32, fuse=False)
    assert "wqkv" in fused["blocks"][0]          # fusion actually happened
    assert "wqkv" not in plain["blocks"][0]

    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 6)), jnp.int32)
    n = jnp.asarray([6], jnp.int32)
    for params in (fused, plain):
        cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        last, cache = llm_prefill(params, toks, n, cache, cfg)
        if params is fused:
            want = np.asarray(last)
        else:
            np.testing.assert_allclose(np.asarray(last), want,
                                       rtol=1e-5, atol=1e-5)


def test_chunk_batched_per_slot_sampling(tmp_path, rng):
    """Per-slot keys/temps: deterministic per slot, independent across
    slots, and a temp-0 slot decodes greedily while others sample."""
    from miotts_tpu.models.llm import llm_generate_chunk_batched
    params, cfg, r = _build(tmp_path)
    r.close()
    B, ctx, W = 3, 64, 8
    toks = rng.integers(0, cfg.n_vocab, (B, 6)).astype(np.int32)
    n_real = jnp.asarray([6, 6, 6], jnp.int32)

    def run(seeds, temps):
        cache = init_kv_cache(cfg, B, ctx, dtype=jnp.float32)
        last, cache = llm_prefill(params, jnp.asarray(toks), n_real,
                                  cache, cfg)
        keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
        buf, *_ = llm_generate_chunk_batched(
            params, last, cache, jnp.asarray([True] * B), keys,
            jnp.asarray(temps, jnp.float32), jnp.asarray([-7], jnp.int32),
            cfg, W)
        return np.asarray(buf)

    a = run([11, 22, 33], [2.0, 2.0, 0.0])
    b = run([11, 22, 33], [2.0, 2.0, 0.0])
    np.testing.assert_array_equal(a, b)                  # deterministic

    c = run([11, 99, 33], [2.0, 2.0, 0.0])
    np.testing.assert_array_equal(a[0], c[0])            # slot independence
    np.testing.assert_array_equal(a[2], c[2])
    assert (a[1] != c[1]).any()                          # seed matters

    # greedy slot matches an all-greedy run's slot
    g = run([1, 2, 3], [0.0, 0.0, 0.0])
    np.testing.assert_array_equal(a[2], g[2])

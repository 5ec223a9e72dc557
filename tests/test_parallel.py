"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miotts_tpu.gguf import GGUFReader, GGML_Q8_0
from miotts_tpu.models.llm import (
    LLMConfig, init_kv_cache, llm_decode_step, llm_forward, llm_prefill,
    load_llm_params,
)
from miotts_tpu.models.synthetic import synthetic_llm_config, write_synthetic_llm
from miotts_tpu.parallel.mesh import make_mesh
from miotts_tpu.parallel.sharding import (
    shard_kv_cache, shard_llm_params,
)


@pytest.fixture(scope="module")
def tp_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("tp")
    # kv heads must divide the model axis: 4 heads / 4 kv heads, model=4
    cfg0 = LLMConfig(arch="qwen2", n_layers=2, dim=64, n_heads=4,
                     n_kv_heads=4, head_dim=16, ff_dim=128,
                     n_vocab=256 + 3 + 64, n_ctx=256,
                     rope_style="neox", qkv_bias=True, qk_norm=False)
    path = str(d / "llm.gguf")
    write_synthetic_llm(path, cfg=cfg0, seed=1)
    with GGUFReader(path) as r:
        cfg = LLMConfig.from_gguf(r)
        params, _ = load_llm_params(r, cfg, dtype=jnp.float32)
    return params, cfg


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    m = make_mesh()
    assert m.shape == {"data": 1, "model": 8}
    m2 = make_mesh(data=2, model=4)
    assert m2.shape == {"data": 2, "model": 4}


def test_tp_forward_matches_single_device(tp_model, rng):
    """TP-sharded forward over (data=2, model=4) must match single-device
    logits — validates that XLA's inserted collectives preserve the math."""
    params, cfg = tp_model
    B, S = 2, 6
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, S)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    cache0 = init_kv_cache(cfg, B, 16, dtype=jnp.float32)
    want, _ = llm_forward(params, toks, pos, cache0, cfg)

    mesh = make_mesh(data=2, model=4)
    with jax.set_mesh(mesh):
        sp = shard_llm_params(params, mesh, cfg)
        sc = shard_kv_cache(init_kv_cache(cfg, B, 16, dtype=jnp.float32), mesh)
        got, new_cache = llm_forward(sp, toks, pos, sc, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_tp_prefill_then_decode(tp_model, rng):
    """Sharded prefill + decode step runs and matches unsharded."""
    params, cfg = tp_model
    B, n = 2, 5
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, n)), jnp.int32)
    nr = jnp.full((B,), n, jnp.int32)

    c0 = init_kv_cache(cfg, B, 16, dtype=jnp.float32)
    last0, c0 = llm_prefill(params, toks, nr, c0, cfg)
    nxt = jnp.asarray(rng.integers(0, cfg.n_vocab, B), jnp.int32)
    s0, _ = llm_decode_step(params, nxt, c0, cfg)

    mesh = make_mesh(data=2, model=4)
    with jax.set_mesh(mesh):
        sp = shard_llm_params(params, mesh, cfg)
        c1 = shard_kv_cache(init_kv_cache(cfg, B, 16, dtype=jnp.float32), mesh)
        last1, c1 = llm_prefill(sp, toks, nr, c1, cfg)
        s1, _ = llm_decode_step(sp, nxt, c1, cfg)
    np.testing.assert_allclose(np.asarray(last1), np.asarray(last0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=2e-4, atol=2e-4)


def test_tp_quantized_weights(tmp_path, rng):
    """Q8_0 QTensor weights shard over the mesh and still match the
    unsharded quantized forward."""
    cfg0 = LLMConfig(arch="qwen2", n_layers=2, dim=64, n_heads=4,
                     n_kv_heads=4, head_dim=16, ff_dim=128,
                     n_vocab=256 + 3 + 64, n_ctx=256,
                     rope_style="neox", qkv_bias=True, qk_norm=False)
    path = str(tmp_path / "llm_q8.gguf")
    write_synthetic_llm(path, cfg=cfg0, quant_type=GGML_Q8_0, seed=2)
    with GGUFReader(path) as r:
        cfg = LLMConfig.from_gguf(r)
        params, _ = load_llm_params(r, cfg, dtype=jnp.float32)

    B, S = 2, 4
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, S)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    want, _ = llm_forward(params, toks, pos,
                          init_kv_cache(cfg, B, 16, dtype=jnp.float32), cfg)

    mesh = make_mesh(data=1, model=8)
    with jax.set_mesh(mesh):
        sp = shard_llm_params(params, mesh, cfg)
        sc = shard_kv_cache(init_kv_cache(cfg, B, 16, dtype=jnp.float32), mesh)
        got, _ = llm_forward(sp, toks, pos, sc, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("quant,env", [
    ("q8_0", {}),
    ("q4_k", {}),
    ("q4_k", {"MIOTTS_PACK4": "1"}),
    ("q8_0", {"MIOTTS_SCALE_BF16": "1"}),
    ("q4_k", {"MIOTTS_PACK4": "1", "MIOTTS_SCALE_BF16": "1"}),
])
def test_tp_quant_matrix(tmp_path, rng, monkeypatch, quant, env):
    """TP sharding parity across the quant-format matrix, incl. the
    nibble-packed (MIOTTS_PACK4) and bf16-scale variants.

    Regression: _apply_spec used to drop QTensor.packed on reconstruction,
    so sharding a nibble-packed tensor silently dequantized garbage."""
    from miotts_tpu.gguf.reader import GGML_Q4_K
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    qt = {"q8_0": GGML_Q8_0, "q4_k": GGML_Q4_K}[quant]
    # Q4_K superblocks need contraction dims that are multiples of 256.
    cfg0 = LLMConfig(arch="qwen2", n_layers=2, dim=256, n_heads=4,
                     n_kv_heads=4, head_dim=64, ff_dim=512,
                     n_vocab=256 + 3 + 64, n_ctx=256,
                     rope_style="neox", qkv_bias=True, qk_norm=False)
    path = str(tmp_path / f"llm_{quant}.gguf")
    write_synthetic_llm(path, cfg=cfg0, quant_type=qt, seed=3)
    with GGUFReader(path) as r:
        cfg = LLMConfig.from_gguf(r)
        params, _ = load_llm_params(r, cfg, dtype=jnp.float32)
    if env.get("MIOTTS_PACK4"):
        from miotts_tpu.ops.qmat import QTensor
        assert any(isinstance(b.get("wqkv"), QTensor) and b["wqkv"].packed
                   for b in params["blocks"]), "pack4 did not take effect"

    B, S = 2, 4
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, S)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    want, _ = llm_forward(params, toks, pos,
                          init_kv_cache(cfg, B, 16, dtype=jnp.float32), cfg)

    mesh = make_mesh(data=2, model=4)
    with jax.set_mesh(mesh):
        sp = shard_llm_params(params, mesh, cfg)
        sc = shard_kv_cache(init_kv_cache(cfg, B, 16, dtype=jnp.float32), mesh)
        got, _ = llm_forward(sp, toks, pos, sc, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sharded_batched_serving_chunk_token_parity(tp_model, rng):
    """The REAL serving path — llm_prefill_slots + llm_generate_chunk_batched
    (chunk-buffered KV, attn-length bucket) — sharded over a (data=2,
    model=4) TP+DP mesh must be TOKEN-EXACT vs the single-device path."""
    from miotts_tpu.models.llm import (
        llm_generate_chunk_batched, llm_prefill_slots,
    )
    params, cfg = tp_model
    n_slots, ctx_len, chunk = 4, 64, 8
    A, S = 2, 8  # two admissions, 8-token prompt bucket
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (A, S)), jnp.int32)
    n_real = jnp.asarray([8, 5], jnp.int32)
    slots = jnp.asarray([0, 2], jnp.int32)
    stop_ids = jnp.asarray([cfg.n_vocab - 1, cfg.n_vocab - 2], jnp.int32)
    keys0 = jax.random.split(jax.random.PRNGKey(7), n_slots)
    temps = jnp.zeros((n_slots,), jnp.float32)  # greedy -> exact parity

    def run(mesh):
        cache = init_kv_cache(cfg, n_slots, ctx_len, dtype=jnp.float32)
        last_logits = jnp.zeros((n_slots, cfg.n_vocab), jnp.float32)
        active = jnp.zeros((n_slots,), bool).at[jnp.asarray([0, 2])].set(True)
        keys = keys0
        p = params
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Psp
            p = shard_llm_params(params, mesh, cfg)
            cache = shard_kv_cache(cache, mesh)
            last_logits = jax.device_put(
                last_logits, NamedSharding(mesh, Psp("data", None)))
        last, cache = llm_prefill_slots(p, toks, n_real, cache, slots, cfg)
        last_logits = last_logits.at[slots].set(last)
        bufs = []
        for attn_len in (32, 0):  # bucketed then full-cache chunk
            buf, active, last_logits, cache, keys = llm_generate_chunk_batched(
                p, last_logits, cache, active, keys, temps, stop_ids, cfg,
                chunk, attn_len)
            bufs.append(np.asarray(buf))
        return np.stack(bufs), np.asarray(active), np.asarray(cache["fill"])

    want_buf, want_active, want_fill = run(None)
    mesh = make_mesh(data=2, model=4)
    with jax.set_mesh(mesh):
        got_buf, got_active, got_fill = run(mesh)
    np.testing.assert_array_equal(got_buf, want_buf)
    np.testing.assert_array_equal(got_active, want_active)
    np.testing.assert_array_equal(got_fill, want_fill)


def test_sharded_batcher_audio_parity(tmp_path_factory, rng):
    """ContinuousBatcher end-to-end on the TP+DP mesh: emitted audio per
    request must match the single-device batcher at the same seeds
    (greedy), chunk for chunk."""
    from miotts_tpu.gguf import write_voice_embedding
    from miotts_tpu.models.synthetic import (
        write_synthetic_codec, write_synthetic_llm,
    )
    from miotts_tpu.runtime.batching import ContinuousBatcher
    from miotts_tpu.runtime.engine import (
        EngineConfig, Options, TTSEngine, VoiceModel,
    )

    d = tmp_path_factory.mktemp("shard_parity")
    codec_path = str(d / "codec.gguf")
    llm_path = str(d / "llm.gguf")
    codec_cfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    write_synthetic_llm(llm_path, seed=5, n_speech=64)
    emb_path = str(d / "voice.emb.gguf")
    write_voice_embedding(
        emb_path,
        np.random.default_rng(11).standard_normal(codec_cfg.adaln_dim) * 0.3)
    eng = TTSEngine(EngineConfig(
        model_path=llm_path, codec_path=codec_path, max_tokens=40,
        llm_dtype="float32", prompt_bucket=32, code_bucket=16,
        holdback_codes=6, min_commit_step_codes=4))
    voice = VoiceModel(emb_path)

    def run(mesh):
        batcher = ContinuousBatcher(eng, n_slots=2, chunk_steps=10, mesh=mesh)
        chunks = {0: [], 1: [], 2: []}

        def cb_factory(i):
            def cb(samples, sr, is_last):
                if samples is not None:
                    chunks[i].append(samples.copy())
                return True
            return cb

        for i, text in enumerate(["parity a", "parity b", "parity c"]):
            batcher.submit(text, voice, cb_factory(i),
                           Options(max_tokens=35, temperature=0.0, seed=1))
        batcher.run_until_done(max_iters=200)
        assert batcher.pending == 0
        return [np.concatenate(chunks[i]) if chunks[i]
                else np.zeros(0, np.float32) for i in range(3)]

    want = run(None)
    mesh = make_mesh(data=2, model=4)
    orig = eng.llm_params
    try:
        with jax.set_mesh(mesh):
            eng.llm_params = shard_llm_params(orig, mesh, eng.llm_cfg)
            got = run(mesh)
    finally:
        eng.llm_params = orig
    for a, b in zip(want, got):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_qtensor_shard_preserves_packed(tmp_path):
    """_apply_spec must propagate `packed` and keep dequant bit-identical."""
    from miotts_tpu.ops.qmat import QTensor
    from miotts_tpu.parallel.sharding import _apply_spec
    from jax.sharding import PartitionSpec as P
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 16, (256, 128), dtype=np.int8)
    scales = rng.standard_normal((256 // 32, 128)).astype(np.float32)
    qt = QTensor(values=jnp.asarray(vals), scales=jnp.asarray(scales),
                 mins=None, group=32, n_out=128).pack4()
    want = np.asarray(qt.dequant_t())
    mesh = make_mesh(data=1, model=8)
    for spec in (P(None, "model"), P("model", None), P()):
        out = _apply_spec(qt, spec, mesh)
        assert out.packed
        np.testing.assert_array_equal(np.asarray(out.dequant_t()), want)


def test_tp_lfm2_hybrid(tmp_path, rng):
    """TP-sharded hybrid (LFM2) forward matches single-device."""
    from miotts_tpu.models.llm import LLMConfig as LC
    cfg0 = LC(arch="lfm2", n_layers=4, dim=64, n_heads=4, n_kv_heads=4,
              head_dim=16, ff_dim=96, n_vocab=256 + 3 + 16, n_ctx=64,
              rope_style="neox", qkv_bias=False, qk_norm=True,
              layer_types=("conv", "attn", "conv", "attn"), conv_l_cache=3)
    path = str(tmp_path / "lfm2.gguf")
    write_synthetic_llm(path, cfg=cfg0, seed=6)
    with GGUFReader(path) as r:
        cfg = LLMConfig.from_gguf(r)
        params, _ = load_llm_params(r, cfg, dtype=jnp.float32)

    B, S = 2, 5
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, S)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    want, _ = llm_forward(params, toks, pos,
                          init_kv_cache(cfg, B, 16, dtype=jnp.float32), cfg)

    mesh = make_mesh(data=2, model=4)
    with jax.set_mesh(mesh):
        sp = shard_llm_params(params, mesh, cfg)
        sc = shard_kv_cache(init_kv_cache(cfg, B, 16, dtype=jnp.float32), mesh)
        got, _ = llm_forward(sp, toks, pos, sc, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

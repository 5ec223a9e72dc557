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

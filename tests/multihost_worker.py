"""Worker process for the multi-host smoke test (spawned by
test_multihost.py).  Each process owns 4 virtual CPU devices; together they
form an 8-device (2 hosts x 4) mesh, and a psum must see all 8 devices."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from miotts_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator=coord, num_processes=n_proc, process_id=pid)

    assert jax.process_count() == n_proc, jax.process_count()
    devices = jax.devices()
    assert len(devices) == 4 * n_proc, len(devices)

    mesh = Mesh(np.array(devices).reshape(n_proc, 4), ("data", "model"))

    def body():
        return jax.lax.psum(jnp.ones(()), ("data", "model"))

    f = jax.shard_map(body, mesh=mesh, in_specs=(), out_specs=P())
    total = jax.jit(f)()
    # replicated scalar: every process sees the full device count
    val = float(np.asarray(total).reshape(-1)[0])
    print(f"RESULT {pid} {val}", flush=True)
    assert val == 4 * n_proc, val

    # --- phase 2: real TP decode step with the 'model' axis spanning the
    # process boundary, so the per-layer TP psums actually cross hosts
    # (DCN path on a pod).  Both processes must compute the same replicated
    # logits checksum.
    import tempfile

    from __graft_entry__ import _build_tiny_models
    from miotts_tpu.models.llm import (
        init_kv_cache, llm_decode_step, llm_prefill,
    )
    from miotts_tpu.parallel.sharding import shard_kv_cache, shard_llm_params
    from jax.sharding import NamedSharding

    # devices[i::?] — reshape(n_proc, 4).T puts one device from EACH
    # process in every 'model' row
    arr = np.array(devices).reshape(n_proc, 4).T      # [4, n_proc]
    mesh2 = Mesh(arr, ("data", "model"))
    params, cfg = _build_tiny_models(tempfile.mkdtemp(prefix="mh_"),
                                     n_kv_heads=max(2, n_proc))
    B, S = 4, 8
    with jax.set_mesh(mesh2):
        sp = shard_llm_params(params, mesh2, cfg)
        cache = shard_kv_cache(init_kv_cache(cfg, B, 32, dtype=jnp.float32),
                               mesh2)
        toks = jax.device_put(
            np.tile(np.arange(S, dtype=np.int32), (B, 1)),
            NamedSharding(mesh2, P("data", None)))
        n_real = jax.device_put(np.full((B,), S, np.int32),
                                NamedSharding(mesh2, P("data")))

        @jax.jit
        def step(sp, toks, n_real, cache):
            # params must be ARGUMENTS: closing over arrays that span
            # non-addressable devices is rejected in multi-controller JAX
            last, cache = llm_prefill(sp, toks, n_real, cache, cfg)
            tok = jnp.argmax(last, -1).astype(jnp.int32)
            logits, cache = llm_decode_step(sp, tok, cache, cfg)
            return jnp.sum(jnp.abs(logits)), tok

        checksum, tok = step(sp, toks, n_real, cache)
        cs = float(np.asarray(checksum))
        tk = np.asarray(tok).tolist()
    assert np.isfinite(cs), cs
    print(f"STEP {pid} {cs:.4f} {tk}", flush=True)

    # --- phase 3 (round 3): one REAL serving chunk — batched slot prefill
    # + chunk-buffered batched decode (the path the ContinuousBatcher
    # dispatches) — with the 'model' axis spanning the process boundary.
    # Greedy sampling, so the cross-process run must be TOKEN-EXACT vs the
    # process-local single-device run (the in-process twin is
    # test_parallel.py::test_sharded_batched_serving_chunk_token_parity).
    from miotts_tpu.models.llm import (
        llm_generate_chunk_batched, llm_prefill_slots,
    )

    n_slots, ctx_len, chunk = 4, 32, 6
    rng = np.random.default_rng(3)
    toks_np = rng.integers(0, cfg.n_vocab, (2, 8)).astype(np.int32)
    n_real_np = np.asarray([8, 5], np.int32)
    slots_np = np.asarray([0, 2], np.int32)
    stop_np = np.asarray([cfg.n_vocab - 1, cfg.n_vocab - 2], np.int32)
    keys0 = jax.random.split(jax.random.PRNGKey(7), n_slots)
    temps = jnp.zeros((n_slots,), jnp.float32)   # greedy -> exact parity

    def run_chunk(mesh, p):
        cache = init_kv_cache(cfg, n_slots, ctx_len, dtype=jnp.float32)
        last_logits = jnp.zeros((n_slots, cfg.n_vocab), jnp.float32)
        active = jnp.zeros((n_slots,), bool).at[jnp.asarray(slots_np)].set(True)
        if mesh is not None:
            cache = shard_kv_cache(cache, mesh)
            last_logits = jax.device_put(
                last_logits, NamedSharding(mesh, P("data", None)))
        last, cache = llm_prefill_slots(
            p, jnp.asarray(toks_np), jnp.asarray(n_real_np), cache,
            jnp.asarray(slots_np), cfg)
        last_logits = last_logits.at[jnp.asarray(slots_np)].set(last)
        buf, active, last_logits, cache, _ = llm_generate_chunk_batched(
            p, last_logits, cache, active, keys0, temps,
            jnp.asarray(stop_np), cfg, chunk, 0)
        return np.asarray(buf)

    local_buf = run_chunk(None, params)
    with jax.set_mesh(mesh2):
        dist_buf = run_chunk(mesh2, sp)
    assert np.array_equal(local_buf, dist_buf), (local_buf, dist_buf)
    print(f"CHUNK {pid} {local_buf.tolist()}", flush=True)

    # --- phase 4 (round 4): a short ContinuousBatcher SESSION across the
    # process boundary — admission waves, chunked batched decode, codec
    # emission, completion — with the 'model' axis spanning processes.
    # Greedy sampling => the distributed run must reproduce the
    # process-local run's speech codes token-for-token (VERDICT r3 item 8).
    import contextlib

    from miotts_tpu.gguf import write_voice_embedding
    from miotts_tpu.models.synthetic import (
        write_synthetic_codec, write_synthetic_llm,
    )
    from miotts_tpu.runtime.batching import ContinuousBatcher
    from miotts_tpu.runtime.engine import (
        EngineConfig, Options, TTSEngine, VoiceModel,
    )

    tmpdir = tempfile.mkdtemp(prefix="mh_batcher_")
    llm_path = os.path.join(tmpdir, "llm.gguf")
    write_synthetic_llm(llm_path, seed=5, n_speech=64)
    codec_path = os.path.join(tmpdir, "codec.gguf")
    codec_cfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    emb_path = os.path.join(tmpdir, "voice.emb.gguf")
    write_voice_embedding(
        emb_path,
        np.random.default_rng(1).standard_normal(codec_cfg.adaln_dim) * 0.3)

    def run_batcher(mesh):
        eng = TTSEngine(EngineConfig(
            model_path=llm_path, codec_path=codec_path, max_tokens=20,
            llm_dtype="float32", prompt_bucket=32, code_bucket=16))
        voice = VoiceModel(emb_path)
        ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
        fin = []
        with ctx:
            if mesh is not None:
                eng.llm_params = shard_llm_params(eng.llm_params, mesh,
                                                  eng.llm_cfg)
            b = ContinuousBatcher(eng, n_slots=4 if mesh is not None else 2,
                                  chunk_steps=10, mesh=mesh)
            for i in range(3):
                b.submit(f"utterance number {i}", voice, lambda *a: True,
                         Options(max_tokens=15, temperature=0.0, seed=i),
                         on_finish=lambda r: fin.append(r))
            b.run_until_done(max_iters=300)
        assert len(fin) == 3 and all(not r.failed for r in fin)
        return {r.req_id: (list(r.codes), r.emitted_samples) for r in fin}

    local_res = run_batcher(None)
    dist_res = run_batcher(mesh2)
    assert local_res == dist_res, (local_res, dist_res)
    n_codes_total = sum(len(c) for c, _ in local_res.values())
    print(f"BATCHER {pid} {n_codes_total} "
          f"{sum(s for _, s in local_res.values())}", flush=True)


if __name__ == "__main__":
    main()

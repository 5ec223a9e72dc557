"""Smoke tests for the tools/ scripts on tiny fixtures (subprocess)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from miotts_tpu.gguf import GGUFReader, write_voice_embedding
from miotts_tpu.models.synthetic import write_synthetic_codec, write_synthetic_llm

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, timeout=timeout, env=env, cwd=ROOT)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools")
    codec = str(d / "codec.gguf")
    llm = str(d / "llm.gguf")
    emb = str(d / "voice.emb.gguf")
    ccfg = write_synthetic_codec(codec, n_codes=64, seed=3)
    write_synthetic_llm(llm, seed=5, n_speech=64)
    write_voice_embedding(
        emb, np.random.default_rng(0).standard_normal(ccfg.adaln_dim) * 0.3)
    return d, codec, llm, emb


def test_quantize_gguf_roundtrip(fixtures):
    d, codec, llm, emb = fixtures
    out = str(d / "llm_q8.gguf")
    r = _run(["tools/quantize_gguf.py", llm, out, "q8_0"])
    assert r.returncode == 0, r.stderr[-2000:]
    with GGUFReader(out) as g:
        assert g.tensors["blk.0.ffn_gate.weight"].type_name == "Q8_0"
        # norms stay f32
        assert g.tensors["blk.0.attn_norm.weight"].type_name == "F32"


def test_check_weights_runs(fixtures):
    d, codec, llm, emb = fixtures
    r = _run(["tools/check_weights.py", codec])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "arch=miocodec" in r.stdout


def test_compare_codec_runs(fixtures):
    d, codec, llm, emb = fixtures
    out = str(d / "cc.wav")
    r = _run(["tools/compare_codec.py", "-c", codec, "-v", emb,
              "--codes", "1,2,3,4,5", "-o", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    assert "audio length" in r.stdout


def test_debug_decoder_save_and_diff(fixtures):
    d, codec, llm, emb = fixtures
    npz = str(d / "stages.npz")
    r = _run(["tools/debug_decoder.py", "-c", codec, "-v", emb,
              "--codes", "1,2,3,4", "--save-npz", npz])
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = _run(["tools/debug_decoder.py", "-c", codec, "-v", emb,
               "--codes", "1,2,3,4", "--diff", npz])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "DIVERGES" not in r2.stdout


def test_create_voice_emb_random(fixtures):
    d, codec, llm, emb = fixtures
    out = str(d / "rand.emb.gguf")
    r = _run(["tools/create_voice_emb.py", "--random", "7", out, "--dim", "16"])
    assert r.returncode == 0, r.stderr[-2000:]
    from miotts_tpu.gguf import load_voice_embedding
    assert load_voice_embedding(out).shape == (16,)

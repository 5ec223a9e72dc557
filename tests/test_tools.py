"""Smoke tests for the offline tools (`tools/*.py`) on synthetic models.

The reference ships these as manual parity utilities (SURVEY.md §2.1 /
§4.1); here each one runs end-to-end in CI via subprocess so the CLIs
stay importable and their output contracts hold.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from miotts_tpu.gguf import GGUFReader, write_voice_embedding
from miotts_tpu.models.synthetic import write_synthetic_codec, write_synthetic_llm

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def run_tool(name, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(TOOLS, name), *args],
        capture_output=True, text=True, timeout=600, env=env)


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools")
    codec = str(d / "codec.gguf")
    llm = str(d / "llm.gguf")
    emb = str(d / "voice.emb.gguf")
    ccfg = write_synthetic_codec(codec, n_codes=64, seed=3)
    write_synthetic_llm(llm, seed=5, n_speech=64)
    write_voice_embedding(
        emb, np.random.default_rng(0).standard_normal(ccfg.adaln_dim) * 0.3)
    return d, codec, llm, emb


def test_compare_codec(paths, tmp_path):
    d, codec, llm, emb = paths
    out = str(tmp_path / "ref.wav")
    r = run_tool("compare_codec.py", "-c", codec, "-v", emb,
                 "--codes", "1,2,3,4,5,6,7,8", "-o", out)
    assert r.returncode == 0, r.stderr
    assert "token_embd" in r.stdout and "audio length" in r.stdout
    assert os.path.exists(out)
    # self-compare must report ~zero error
    r2 = run_tool("compare_codec.py", "-c", codec, "-v", emb,
                  "--codes", "1,2,3,4,5,6,7,8", "--compare", out)
    assert r2.returncode == 0, r2.stderr
    # self-compare: correlation ~1 (int16 WAV round-trip is the only noise)
    corr = float(r2.stdout.split("correlation=")[1].split()[0])
    assert corr > 0.999


def test_check_weights_codec(paths):
    d, codec, llm, emb = paths
    r = run_tool("check_weights.py", codec)
    assert r.returncode == 0, r.stderr
    assert "arch=miocodec" in r.stdout


def test_check_weights_llm(paths):
    d, codec, llm, emb = paths
    r = run_tool("check_weights.py", llm)
    assert r.returncode == 0, r.stderr
    assert "kind=llm" in r.stdout


def test_debug_decoder_npz_roundtrip(paths, tmp_path):
    d, codec, llm, emb = paths
    npz = str(tmp_path / "stages.npz")
    r = run_tool("debug_decoder.py", "-c", codec, "-v", emb,
                 "--codes", "1,2,3,4", "--save-npz", npz)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(npz)
    # diff against itself: every stage must match
    r2 = run_tool("debug_decoder.py", "-c", codec, "-v", emb,
                  "--codes", "1,2,3,4", "--diff", npz)
    assert r2.returncode == 0, r2.stderr


def test_debug_decoder_substeps_cli(paths, tmp_path):
    """--substeps N: sub-op dump + npz-diff workflow (the day-1 bisection
    tool when real checkpoints land)."""
    d, codec, llm, emb = paths
    npz = str(tmp_path / "substeps.npz")
    r = run_tool("debug_decoder.py", "-c", codec, "-v", emb,
                 "--codes", "1,2,3,4", "--substeps", "0", "--save-npz", npz)
    assert r.returncode == 0, r.stderr
    assert "manual-vs-production" in r.stdout
    assert "attn_probs" in r.stdout
    r2 = run_tool("debug_decoder.py", "-c", codec, "-v", emb,
                  "--codes", "1,2,3,4", "--substeps", "0", "--diff", npz)
    assert r2.returncode == 0, r2.stderr
    assert "DIVERGES" not in r2.stdout


def test_quantize_gguf(paths, tmp_path):
    d, codec, llm, emb = paths
    out = str(tmp_path / "codec.q8_0.gguf")
    r = run_tool("quantize_gguf.py", codec, out, "q8_0")
    assert r.returncode == 0, r.stderr
    with GGUFReader(out) as rd:
        assert str(rd.kv.get("general.architecture", "")) == "miocodec"
    # the quantized file must still pass the loader round-trip check
    r2 = run_tool("check_weights.py", out)
    assert r2.returncode == 0, r2.stderr


def test_create_voice_emb_random(tmp_path):
    out = str(tmp_path / "rnd.emb.gguf")
    r = run_tool("create_voice_emb.py", "--random", "7", out, "--dim", "32")
    assert r.returncode == 0, r.stderr
    from miotts_tpu.gguf import load_voice_embedding
    emb = load_voice_embedding(out)
    assert emb.shape == (32,)


def test_reference_test_vector_is_exact():
    """The default parity codes must equal the reference's fixed vector
    BYTE-FOR-BYTE (`/root/reference/tools/compare_codec.py:50-51`) — day-1
    cross-implementation npz diffs need identical inputs, so a drifted
    default silently invalidates the whole workflow."""
    from miotts_tpu.models.codec import REFERENCE_TEST_CODES
    assert REFERENCE_TEST_CODES == [
        12287, 11619, 11774, 12223, 2490, 826, 2257, 1668, 1219, 2319,
        9994, 12683, 12745, 4215, 12478, 8800, 8696, 375, 1406, 12396]
    # both tools default to it (compare_codec imports it as DEFAULT_CODES;
    # debug_decoder builds its default from the same constant)
    import importlib.util as iu
    spec = iu.spec_from_file_location(
        "cc", __file__.rsplit("/", 2)[0] + "/tools/compare_codec.py")
    mod = iu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.DEFAULT_CODES) == REFERENCE_TEST_CODES

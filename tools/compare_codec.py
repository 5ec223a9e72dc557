#!/usr/bin/env python3
"""Stage-by-stage codec parity dump: fixed code vector -> per-stage stats.

Counterpart of `/root/reference/tools/compare_codec.py`: pushes a fixed
20-code vector (`compare_codec.py:50-51`) through the decoder, prints the
shape/min/max/mean of each stage, writes the final WAV, and (optionally)
compares against another WAV by RMS/correlation/MSE.  The stage dumps are
the bisection tool for quality-parity debugging against upstream
(SURVEY.md §4.1).

Usage: compare_codec.py -c CODEC.gguf -v VOICE.emb.gguf [-o out.wav]
       [--compare other.wav] [--codes 100,200,...]
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

# the reference's fixed test vector (compare_codec.py:50-51) — identical
# values so cross-implementation npz diffs use identical inputs
from miotts_tpu.models.codec import REFERENCE_TEST_CODES as DEFAULT_CODES


def stats(name, x):
    x = np.asarray(x)
    print(f"  {name:28s} shape={str(tuple(x.shape)):18s} "
          f"min={x.min():+.4f} max={x.max():+.4f} mean={x.mean():+.4f}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--codec", required=True)
    ap.add_argument("-v", "--voice", required=True)
    ap.add_argument("-o", "--output", default="")
    ap.add_argument("--compare", default="")
    ap.add_argument("--codes", default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from miotts_tpu.gguf import GGUFReader, load_voice_embedding
    from miotts_tpu.models.codec import codec_decode_spec, load_codec_params
    from miotts_tpu.ops.istft import spec_to_audio
    from miotts_tpu.audio.wav import wav_read, wav_write

    codes = ([int(c) for c in args.codes.split(",")] if args.codes
             else DEFAULT_CODES)
    with GGUFReader(args.codec) as r:
        params, cfg = load_codec_params(r)
    emb = load_voice_embedding(args.voice)

    n_emb = min(len(codes), params["token_embd"].shape[0] - 1)
    codes = [min(c, params["token_embd"].shape[0] - 1) for c in codes]
    print(f"decoding {len(codes)} codes, voice dim {emb.shape[0]}")

    cj = jnp.asarray(codes, jnp.int32)
    ej = jnp.asarray(emb, jnp.float32)
    stats("token_embd[codes]", params["token_embd"][cj])
    log_mag, phase = codec_decode_spec(params, cj, ej, cfg)
    stats("log_mag", log_mag)
    stats("phase", phase)
    audio = np.asarray(spec_to_audio(
        log_mag, phase, params["istft_cos_basis"], params["istft_sin_basis"],
        params["istft_hann"], cfg.hop_length))
    stats("audio", audio)
    print(f"  audio length: {len(audio)} samples "
          f"({len(audio) / cfg.sample_rate:.3f}s), "
          f"expected {len(codes) * cfg.samples_per_token}")

    if args.output:
        wav_write(args.output, audio, cfg.sample_rate)
        print(f"wrote {args.output}")

    if args.compare:
        other, sr = wav_read(args.compare)
        n = min(len(audio), len(other))
        a, b = audio[:n], other[:n]
        print(f"compare vs {args.compare} ({n} samples):")
        print(f"  rms_a={np.sqrt(np.mean(a ** 2)):.6f} "
              f"rms_b={np.sqrt(np.mean(b ** 2)):.6f}")
        if np.std(a) > 0 and np.std(b) > 0:
            print(f"  correlation={np.corrcoef(a, b)[0, 1]:.6f}")
        print(f"  mse={np.mean((a - b) ** 2):.8f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

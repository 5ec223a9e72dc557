#!/usr/bin/env python3
"""Create a `.emb.gguf` voice embedding from a reference audio file.

Counterpart of `/root/reference/tools/create_voice_emb.py`: load audio ->
mono -> resample to the codec sample rate -> peak normalize -> MioCodec
encoder `encode(return_global=True)` -> 128-dim f32 -> GGUF (arch
"mio-embedding", tensor "mio.global_embedding").

The encoder network is NOT part of the runtime (the C++ reference never
ports it either — `miocodec.cpp:816-853` only reads embeddings), so this
tool requires the upstream `miocodec` PyPI package, exactly like the
reference tool does.  Without it, use `--random` to generate a seeded random
embedding for testing.

Usage:
  create_voice_emb.py INPUT.wav OUTPUT.emb.gguf [--model REPO]
  create_voice_emb.py --random SEED OUTPUT.emb.gguf [--dim 128]
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from miotts_tpu.audio.wav import wav_read
from miotts_tpu.gguf import write_voice_embedding


def load_audio_mono(path: str) -> tuple[np.ndarray, int]:
    try:
        import soundfile as sf  # optional
        data, sr = sf.read(path, dtype="float32", always_2d=True)
        return data.mean(axis=1), sr
    except ImportError:
        return wav_read(path)


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return x
    n_out = int(round(len(x) * sr_out / sr_in))
    t_out = np.arange(n_out) * (sr_in / sr_out)
    return np.interp(t_out, np.arange(len(x)), x).astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="input audio file (or SEED with --random)")
    ap.add_argument("output", help="output .emb.gguf path")
    ap.add_argument("--model", default="Aratako/MioCodec-25Hz-44.1kHz-v2")
    ap.add_argument("--random", action="store_true",
                    help="write a seeded random embedding (no encoder needed)")
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    if args.random:
        rng = np.random.default_rng(int(args.input))
        emb = (rng.standard_normal(args.dim) * 0.3).astype(np.float32)
        write_voice_embedding(args.output, emb, name=f"random-{args.input}")
        print(f"wrote random {args.dim}-dim embedding: {args.output}")
        return 0

    try:
        from miocodec import MioCodecModel  # upstream encoder (pip)
        import torch
    except ImportError:
        print("error: the `miocodec` package (and torch) are required to "
              "encode audio; install them or use --random for testing",
              file=sys.stderr)
        return 1

    audio, sr = load_audio_mono(args.input)
    model = MioCodecModel.from_pretrained(args.model).eval()
    target_sr = int(getattr(model, "sample_rate", 44100))
    audio = resample_linear(audio, sr, target_sr)
    peak = np.abs(audio).max()
    if peak > 1e-8:
        audio = audio / peak
    with torch.no_grad():
        out = model.encode(torch.from_numpy(audio)[None, :],
                           return_content=False, return_global=True)
    emb = out[-1] if isinstance(out, (tuple, list)) else out
    emb = np.asarray(emb).reshape(-1).astype(np.float32)
    write_voice_embedding(args.output, emb, name=args.input)
    print(f"wrote {emb.shape[0]}-dim embedding: {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

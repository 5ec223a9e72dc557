#!/usr/bin/env python3
"""Per-stage codec decoder activation dump (parity bisection tool).

Counterpart of `/root/reference/tools/debug_decoder_layer0.py` /
`debug_decoder_substeps.py`: runs a fixed code vector through the decoder,
printing shape/min/max/mean/std of every stage, and optionally saves the
activations as an .npz golden for cross-implementation diffing.

Usage: debug_decoder.py -c CODEC.gguf -v VOICE.emb.gguf
       [--codes 100,200,...] [--save-npz stages.npz] [--diff other.npz]
       [--substeps LAYER]   # bisect SUB-OPS inside one wave_decoder layer
                            # (cond-proj, modulated norm, QKV, RoPE, probs,
                            # gated residuals, SwiGLU — the reference's
                            # debug_decoder_substeps.py:75-229 granularity)
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--codec", required=True)
    ap.add_argument("-v", "--voice", required=True)
    ap.add_argument("--codes", default="")
    ap.add_argument("--save-npz", default="")
    ap.add_argument("--diff", default="",
                    help="compare against a previously saved .npz")
    ap.add_argument("--substeps", type=int, default=-1, metavar="LAYER",
                    help="expand wave_decoder layer LAYER op by op instead "
                         "of the whole-stage dump")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from miotts_tpu.gguf import GGUFReader, load_voice_embedding
    from miotts_tpu.models.codec import (
        REFERENCE_TEST_CODES, codec_decode_stages,
        codec_decoder_layer_substeps, load_codec_params,
    )

    codes = ([int(c) for c in args.codes.split(",")] if args.codes
             else list(REFERENCE_TEST_CODES))
    with GGUFReader(args.codec) as r:
        params, cfg = load_codec_params(r)
    emb = load_voice_embedding(args.voice)
    vmax = params["token_embd"].shape[0] - 1
    codes = [min(c, vmax) for c in codes]

    if args.substeps >= 0:
        stages, max_diff = codec_decoder_layer_substeps(
            params, codes, emb, cfg, layer=args.substeps)
        print(f"wave_decoder layer {args.substeps} sub-ops "
              f"({len(codes)} codes):")
        print(f"  manual-vs-production layer max diff: {max_diff:.3e}")
    else:
        stages, (log_mag, phase) = codec_decode_stages(params, codes, emb, cfg)
        print(f"{len(codes)} codes -> {log_mag.shape[0]} STFT frames")
    for name, x in stages.items():
        print(f"  {name:16s} shape={str(tuple(x.shape)):16s} "
              f"min={x.min():+.4f} max={x.max():+.4f} "
              f"mean={x.mean():+.4f} std={x.std():.4f}")

    if args.save_npz:
        np.savez(args.save_npz, **stages)
        print(f"saved {len(stages)} stages to {args.save_npz}")

    if args.diff:
        other = np.load(args.diff)
        print(f"diff vs {args.diff}:")
        for name, x in stages.items():
            if name not in other:
                print(f"  {name:16s} MISSING in reference")
                continue
            y = other[name]
            if x.shape != y.shape:
                print(f"  {name:16s} SHAPE MISMATCH {x.shape} vs {y.shape}")
                continue
            d = np.abs(x - y).max()
            print(f"  {name:16s} max_abs_diff={d:.3e}"
                  f" {'OK' if d < 1e-3 else '** DIVERGES **'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

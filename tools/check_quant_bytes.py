#!/usr/bin/env python3
"""Cross-check the K-quant byte decoders on REAL tensor bytes.

Round 4 pinned the Q4_K / Q6_K decoders to the ggml spec with hand-built
byte fixtures (tests/test_gguf.py); this tool extends that pin to real
checkpoint bytes the moment they are reachable (VERDICT r4 item 8c): for
one tensor of each quantized format present in MODEL.gguf it decodes the
raw block bytes through every independent path in the repo —

  1. the pure-numpy spec decoder (`gguf.quants.dequantize`, written against
     the ggml block layout, `ggml-quants.c` equivalents),
  2. the numpy repack (`to_group_quant` -> QTensor.dequant),
  3. the native C++ repack (`native/miotts_native.cpp` -> QTensor.dequant),

and asserts all three agree bit-exactly (the repacks are lossless
relayouts of the same decode rule).  Also prints the first super-block's
decoded values so a spot-diff against llama.cpp's own dequantization is a
copy-paste away.

Usage: check_quant_bytes.py MODEL.gguf
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model")
    ap.add_argument("--per-format", type=int, default=1,
                    help="tensors to check per quant format")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from miotts_tpu.gguf import GGUFReader
    from miotts_tpu.gguf import native as _native
    from miotts_tpu.gguf.quants import dequantize, is_quantized, to_group_quant
    from miotts_tpu.ops.qmat import QTensor, qtensor_from_raw

    n_bad = 0
    with GGUFReader(args.model) as r:
        seen: dict[str, int] = {}
        for name in r.tensor_order:
            info = r.tensors[name]
            if not is_quantized(info.ggml_type) or len(info.shape) != 2:
                continue
            if seen.get(info.type_name, 0) >= args.per_format:
                continue
            seen[info.type_name] = seen.get(info.type_name, 0) + 1
            rows, cols = info.shape
            # copy: tensor_raw is a zero-copy mmap view and kept references
            # would block GGUFReader.close()
            raw = r.tensor_raw(name).copy()

            # 1. spec decoder straight off the bytes
            spec = dequantize(raw, info.ggml_type, rows * cols)
            spec = spec.reshape(rows, cols)

            # 2. numpy repack -> dequant
            gq = to_group_quant(raw, info.ggml_type, rows, cols)
            np_deq = np.asarray(QTensor.from_group_quant(gq).dequant())

            # 3. native C++ repack -> dequant (when built)
            nat_deq = None
            if _native.available():
                qt = qtensor_from_raw(raw, info.ggml_type, rows, cols,
                                      pack4=False)
                nat_deq = np.asarray(qt.dequant())

            d12 = np.abs(spec - np_deq).max()
            ok = d12 == 0.0
            line = (f"{name:55s} {info.type_name:6s} {rows}x{cols} "
                    f"spec-vs-numpy max|d|={d12:.1e}")
            if nat_deq is not None:
                d13 = np.abs(spec - nat_deq).max()
                ok = ok and d13 == 0.0
                line += f" spec-vs-native max|d|={d13:.1e}"
            print(line + ("  OK" if ok else "  MISMATCH"))
            if not ok:
                n_bad += 1

            # first super-block decode for external spot-diff vs llama.cpp
            blk = 256 if info.type_name in ("Q4_K", "Q6_K", "Q5_K") else 32
            vals = spec.reshape(-1)[:blk]
            print(f"  first block ({blk}): "
                  + " ".join(f"{v:.6g}" for v in vals[:16]) + " ...")

    if not seen:
        print("no 2D quantized tensors found")
        return 1
    print(f"checked {sum(seen.values())} tensors across {sorted(seen)}; "
          f"{n_bad} mismatches")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())

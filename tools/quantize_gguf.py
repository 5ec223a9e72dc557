#!/usr/bin/env python3
"""Quantize a GGUF model: rewrite 2-D weight matrices in a lower-bit format.

The reference consumes pre-quantized GGUFs from HF (BF16/Q8_0/Q6_K/Q4_K_M,
`/root/reference/README.md:196`) but ships no quantizer; this framework
includes one so checkpoints can be converted locally.

Usage: quantize_gguf.py IN.gguf OUT.gguf {q8_0,q6_k,q5_k,q4_k,q4_0,f16,bf16}

1-D tensors (norms, biases) and token embeddings stay f32, matching
llama.cpp's convention.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from miotts_tpu.gguf import GGUFReader, GGUFWriter
from miotts_tpu.gguf.reader import (
    GGML_BF16, GGML_F16, GGML_F32, GGML_I32, GGML_Q4_0, GGML_Q4_K,
    GGML_Q5_K, GGML_Q6_K, GGML_Q8_0,
)

FORMATS = {
    "q8_0": GGML_Q8_0, "q6_k": GGML_Q6_K, "q4_k": GGML_Q4_K,
    "q5_k": GGML_Q5_K, "q4_0": GGML_Q4_0, "f16": GGML_F16, "bf16": GGML_BF16,
}

_KEEP_F32 = ("token_embd.weight",)


def quantize_file(src: str, dst: str, fmt: str) -> None:
    gtype = FORMATS[fmt]
    blk = 256 if fmt in ("q6_k", "q5_k", "q4_k") else 32
    with GGUFReader(src) as r:
        w = GGUFWriter(dst)
        for key, val in r.kv.items():
            if key == "general.alignment":
                continue
            if isinstance(val, list):
                w.add_array(key, val)
            else:
                w.add_kv(key, val)
        w.add_kv("general.quantized_by", "miotts_tpu quantize_gguf")
        for name in r.tensor_order:
            info = r.tensors[name]
            if info.ggml_type == GGML_I32:
                w.add_tensor(name, r.tensor_np(name), GGML_I32)
                continue
            data = r.tensor_f32(name)
            quantizable = (data.ndim == 2 and name not in _KEEP_F32
                           and data.shape[-1] % blk == 0)
            w.add_tensor(name, data, gtype if quantizable else GGML_F32)
        w.write()
    print(f"wrote {dst} ({fmt})")


if __name__ == "__main__":
    if len(sys.argv) != 4 or sys.argv[3] not in FORMATS:
        print(__doc__, file=sys.stderr)
        sys.exit(1)
    quantize_file(sys.argv[1], sys.argv[2], sys.argv[3])

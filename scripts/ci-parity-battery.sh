#!/usr/bin/env bash
# Drill the day-1 real-checkpoint battery end-to-end (CI / local, no TPU,
# no network): build a synthetic checkpoint set NAMED and SHAPED like the
# real downloads — including a tools/quantize_gguf.py round-trip so the
# battery's loader step sees a quantized file exactly like day 1 will, and
# llama.cpp's Q4_K_M per-tensor format mix on the LLM — then run
# scripts/real-model-parity.sh on it.  Proves all battery steps EXECUTE;
# quality parity itself still needs the real weights (STATUS.md §Gaps).
set -euo pipefail
cd "$(dirname "$0")/.."
D="${1:-/tmp/miotts_fake_models}"
rm -rf "$D"
mkdir -p "$D"

python - "$D" << 'EOF'
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
d = sys.argv[1]
from miotts_tpu.gguf import GGML_Q4_K, write_voice_embedding
from miotts_tpu.models.synthetic import write_synthetic_codec, write_synthetic_llm
# full speech-token id space so the reference's fixed 20-code vector
# (codes up to 12745) runs unclamped; tiny dims keep CI fast
cfgc = write_synthetic_codec(d + "/miocodec_f32.gguf", n_codes=12800, seed=3)
# mixed_k reproduces llama.cpp's Q4_K_M per-tensor mix (Q6_K attn_v /
# ffn_down next to Q4_K) — the loader fusion sees real-file heterogeneity.
# dims are multiples of the 256-element K-quant superblock.
from miotts_tpu.models.llm import LLMConfig
cfg = LLMConfig(arch="qwen2", n_layers=2, dim=256, n_heads=4, n_kv_heads=2,
                head_dim=64, ff_dim=512, n_vocab=256 + 3 + 12800,
                n_ctx=2048, rope_theta=1e6, rope_style="neox",
                qkv_bias=True, qk_norm=False)
write_synthetic_llm(d + "/MioTTS-synthetic-Q4_K_M.gguf", seed=5,
                    quant_type=GGML_Q4_K, cfg=cfg, mixed_k=True)
# a smaller same-vocab draft so the battery's speculative-decoding step
# (greedy draft-verify parity) executes in CI too
import dataclasses
dcfg = dataclasses.replace(cfg, n_layers=1, ff_dim=256)
write_synthetic_llm(d + "/MioTTS-0.1B-synthetic-Q4_K.gguf", seed=11,
                    quant_type=GGML_Q4_K, cfg=dcfg)
rng = np.random.default_rng(7)
write_voice_embedding(d + "/jp_female.emb.gguf",
                      (rng.standard_normal(cfgc.adaln_dim) * 0.3)
                      .astype(np.float32))
print("synthetic checkpoint set ->", d)
EOF

# real codec downloads are quantized — route ours through the quantizer so
# step 1's loader round-trip covers the quantized path
MIOTTS_PLATFORM=cpu python tools/quantize_gguf.py \
    "$D/miocodec_f32.gguf" "$D/miocodec.gguf" q8_0
rm "$D/miocodec_f32.gguf"

# the battery globs MioTTS-*.gguf / *.emb.gguf / miocodec.gguf
PARITY_PLATFORM=cpu PARITY_OUT="$D/parity_out" \
    scripts/real-model-parity.sh "$D"

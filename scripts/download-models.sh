#!/usr/bin/env bash
# Download the MioTTS model set (codec + voices + LLM GGUFs) from HF.
# Counterpart of /root/reference/scripts/download-models.sh:58-70 — same
# repos and file layout, so paths drop straight into the CLI examples.
set -euo pipefail

MODELS_DIR="${MODELS_DIR:-models}"
ALL_MODELS=0
[[ "${1:-}" == "--all-models" ]] && ALL_MODELS=1

mkdir -p "$MODELS_DIR"

if ! command -v hf >/dev/null 2>&1 && ! command -v huggingface-cli >/dev/null 2>&1; then
    echo "error: install the Hugging Face CLI (pip install -U huggingface_hub)" >&2
    exit 1
fi
HF=hf
command -v hf >/dev/null 2>&1 || HF=huggingface-cli

echo "Downloading MioCodec + voice embeddings (mmnga-o/miotts-cpp-gguf)..."
$HF download mmnga-o/miotts-cpp-gguf \
    --include "miocodec.gguf" "*.emb.gguf" \
    --local-dir "$MODELS_DIR"

if [[ "$ALL_MODELS" == 1 ]]; then
    echo "Downloading ALL MioTTS LLM GGUFs (Aratako/MioTTS-GGUF)..."
    $HF download Aratako/MioTTS-GGUF --include "*.gguf" --local-dir "$MODELS_DIR"
else
    echo "Downloading default LLM (MioTTS-0.1B-Q8_0)..."
    $HF download Aratako/MioTTS-GGUF \
        --include "MioTTS-0.1B-Q8_0.gguf" --local-dir "$MODELS_DIR"
fi

echo "Done. Files in $MODELS_DIR:"
ls -lh "$MODELS_DIR"

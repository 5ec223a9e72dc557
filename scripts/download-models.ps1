# Download the MioTTS model set (codec + voices + LLM GGUFs) from HF.
# Counterpart of /root/reference/scripts/download-models.ps1 — same repos
# and file layout.
param(
    [switch]$AllModels,
    [string]$ModelsDir = "models"
)

$ErrorActionPreference = "Stop"
New-Item -ItemType Directory -Force -Path $ModelsDir | Out-Null

$hf = Get-Command hf -ErrorAction SilentlyContinue
if (-not $hf) { $hf = Get-Command huggingface-cli -ErrorAction SilentlyContinue }
if (-not $hf) {
    Write-Error "Install the Hugging Face CLI: pip install -U huggingface_hub"
}

Write-Host "Downloading MioCodec + voice embeddings (mmnga-o/miotts-cpp-gguf)..."
& $hf.Name download mmnga-o/miotts-cpp-gguf --include "miocodec.gguf" "*.emb.gguf" --local-dir $ModelsDir

if ($AllModels) {
    Write-Host "Downloading ALL MioTTS LLM GGUFs (Aratako/MioTTS-GGUF)..."
    & $hf.Name download Aratako/MioTTS-GGUF --include "*.gguf" --local-dir $ModelsDir
} else {
    Write-Host "Downloading default LLM (MioTTS-0.1B-Q8_0)..."
    & $hf.Name download Aratako/MioTTS-GGUF --include "MioTTS-0.1B-Q8_0.gguf" --local-dir $ModelsDir
}

Get-ChildItem $ModelsDir

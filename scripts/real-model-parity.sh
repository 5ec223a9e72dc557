#!/usr/bin/env bash
# Day-1 parity workflow for REAL MioTTS/MioCodec checkpoints.
#
# The framework has only ever run synthetic weights at real shapes (this
# environment has no network egress); the moment real model files are
# available, this ONE command runs the full quality-parity battery:
#
#   1. loader round-trip     (tools/check_weights.py — every tensor
#                             bit-identical through load+dequant)
#   2. codec stage dump      (tools/compare_codec.py — the reference's fixed
#                             20-code vector; WAV compare when a reference
#                             CPU WAV is provided)
#   3. sub-op bisection      (tools/debug_decoder.py --substeps 0 — npz
#                             golden; diff against a reference dump of
#                             /root/reference/tools/debug_decoder_substeps.py)
#   4. end-to-end synth      (cli synth + analyze — real speech, health
#                             report; spectral stats should now pass)
#   5. stream-vs-offline     (cli compare — MAE/RMSE/best-lag, the
#                             reference's stream-compare contract)
#
# Usage:
#   scripts/download-models.sh                   # fetch models/ from HF
#   scripts/real-model-parity.sh [MODELS_DIR] [REF_WAV]
#
#   MODELS_DIR  directory with miocodec.gguf, *.emb.gguf, MioTTS-*.gguf
#               (default: models)
#   REF_WAV     optional WAV produced by the reference C++ build for the
#               fixed 20-code vector (tools/compare_codec.py upstream) —
#               enables the cross-implementation audio compare.
set -uo pipefail
cd "$(dirname "$0")/.."

# PARITY_PLATFORM=cpu keeps the battery off the serving chip (this image's
# sitecustomize pins a TPU and ignores JAX_PLATFORMS; the CLI honors
# MIOTTS_PLATFORM).  Default: whatever the environment provides.
[ -n "${PARITY_PLATFORM:-}" ] && export MIOTTS_PLATFORM="$PARITY_PLATFORM"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"

MODELS="${1:-models}"
REF_WAV="${2:-}"
OUT="${PARITY_OUT:-parity_out}"
mkdir -p "$OUT"

CODEC="$MODELS/miocodec.gguf"
# prefer a non-0.1B target so the 0.1B (if present) stays the spec draft
LLM=$(ls "$MODELS"/MioTTS-*.gguf 2>/dev/null | grep -v "0\.1B" | head -1)
[ -n "$LLM" ] || LLM=$(ls "$MODELS"/MioTTS-*.gguf 2>/dev/null | head -1)
VOICE=$(ls "$MODELS"/*.emb.gguf 2>/dev/null | head -1)

fail=0
step() { echo; echo "=== $* ==="; }

[ -f "$CODEC" ] || { echo "missing $CODEC (run scripts/download-models.sh)"; exit 1; }
[ -n "$VOICE" ] || { echo "missing voice *.emb.gguf in $MODELS"; exit 1; }

step "1. loader round-trip: codec"
python tools/check_weights.py "$CODEC" || fail=1
if [ -n "$LLM" ]; then
    step "1b. loader round-trip: LLM ($LLM)"
    python tools/check_weights.py "$LLM" || fail=1
fi

step "2. codec stage dump (fixed 20-code vector)"
if [ -n "$REF_WAV" ]; then
    python tools/compare_codec.py -c "$CODEC" -v "$VOICE" \
        -o "$OUT/codec_fixed20.wav" --compare "$REF_WAV" || fail=1
else
    python tools/compare_codec.py -c "$CODEC" -v "$VOICE" \
        -o "$OUT/codec_fixed20.wav" || fail=1
    echo "(no REF_WAV given — rerun with the reference build's WAV to get"
    echo " the cross-implementation RMS/correlation numbers)"
fi

step "3. wave_decoder layer-0 sub-op golden ($OUT/substeps_l0.npz)"
python tools/debug_decoder.py -c "$CODEC" -v "$VOICE" \
    --substeps 0 --save-npz "$OUT/substeps_l0.npz" || fail=1
echo "(diff against a reference dump with: tools/debug_decoder.py ... "
echo " --substeps 0 --diff REF.npz — per-sub-op max-abs-diff bisection)"

step "4. whole-stage golden ($OUT/stages.npz)"
python tools/debug_decoder.py -c "$CODEC" -v "$VOICE" \
    --save-npz "$OUT/stages.npz" || fail=1

if [ -n "$LLM" ]; then
    step "5. end-to-end synth + health report"
    python -m miotts_tpu.cli synth -m "$LLM" -c "$CODEC" -v "$VOICE" \
        -p "こんにちは、音声合成のテストです。" --max-tokens 256 --seed 42 \
        -o "$OUT/synth.wav" || fail=1
    python -m miotts_tpu.cli analyze "$OUT/synth.wav" || fail=1

    step "6. stream-vs-offline fidelity (stream-compare contract)"
    python -m miotts_tpu.cli compare -m "$LLM" -c "$CODEC" -v "$VOICE" \
        -p "ストリーミングとオフラインの比較テスト。" --max-tokens 256 \
        --seed 42 || fail=1

    # 7. speculative decoding: with a second (smaller) family model
    # available, greedy draft-verify output must be byte-identical to
    # plain greedy synthesis — AND this measures the real acceptance rate
    # (synthetic weights cannot; benchmarks/bench_spec.py curve applies)
    DRAFT=$(ls "$MODELS"/MioTTS-0.1B-*.gguf 2>/dev/null | head -1)
    if [ -n "$DRAFT" ] && [ "$DRAFT" != "$LLM" ]; then
        step "7. speculative greedy parity (draft: $DRAFT)"
        python -m miotts_tpu.cli synth -m "$LLM" -c "$CODEC" -v "$VOICE" \
            -p "こんにちは、音声合成のテストです。" --max-tokens 256 -t 0 \
            --seed 42 -o "$OUT/synth_greedy.wav" || fail=1
        python -m miotts_tpu.cli synth -m "$LLM" -c "$CODEC" -v "$VOICE" \
            --draft-model "$DRAFT" --spec-tokens 6 \
            -p "こんにちは、音声合成のテストです。" --max-tokens 256 -t 0 \
            --seed 42 -o "$OUT/synth_spec.wav" || fail=1
        if cmp -s "$OUT/synth_greedy.wav" "$OUT/synth_spec.wav"; then
            echo "speculative greedy parity: BYTE-IDENTICAL"
        else
            # not an automatic failure: at bf16 a near-tie argmax can flip
            # between the S=1 decode and S=K+1 verify logit paths (same
            # class as XLA fusion nondeterminism); f32 (llm_dtype) is exact
            echo "speculative WAVs differ — check for near-tie flips:"
            python -m miotts_tpu.cli analyze "$OUT/synth_greedy.wav" \
                "$OUT/synth_spec.wav" || fail=1
        fi
    fi
else
    echo; echo "(no MioTTS-*.gguf found — LLM steps skipped)"
fi

step "8. K-quant byte decoders on real tensor bytes (r4 fixtures -> real)"
python tools/check_quant_bytes.py "$CODEC" || fail=1
if [ -n "$LLM" ]; then
    python tools/check_quant_bytes.py "$LLM" || fail=1
fi

if [ -n "$LLM" ]; then
    step "9. serve-config stream-vs-offline fidelity (batched path)"
    # Synthetic-weight serve rmse (~0.6) is attributed to the codec's
    # ~192-code receptive field exceeding the 32-code holdback; a trained
    # codec's field decays fast, so this remeasures the claim with real
    # weights (expect collapse toward the wire bound; the holdback knob
    # MIOTTS_HOLDBACK sweeps the crossover if it does not).
    MIOTTS_COMPARE_LLM="$LLM" MIOTTS_COMPARE_CODEC="$CODEC" \
        MIOTTS_COMPARE_EMB="$VOICE" MIOTTS_BENCH_TOKENS=256 \
        python benchmarks/bench_compare.py || fail=1

    # 10. REAL speculative acceptance + achieved spec throughput for every
    # draft/target pairing present (synthetic weights measure acceptance
    # ~0 by construction — THIS is the number the 2-3x single-stream
    # claim hangs on; benchmarks/RESULTS.md r4 spec tables map acceptance
    # -> tok/s).  cli bench prints stream_bench.spec_accept_rate and the
    # decode rate through the full streaming engine.
    DRAFT=$(ls "$MODELS"/MioTTS-0.1B-*.gguf 2>/dev/null | head -1)
    if [ -n "$DRAFT" ]; then
        for TARGET in $(ls "$MODELS"/MioTTS-*.gguf | grep -v "0\.1B"); do
            step "10. real draft acceptance: 0.1B -> $(basename "$TARGET")"
            python -m miotts_tpu.cli bench -m "$TARGET" -c "$CODEC" \
                -v "$VOICE" --draft-model "$DRAFT" --spec-tokens 6 \
                -p "ドラフト検証のための音声合成ベンチマークです。" \
                --max-tokens 256 --seed 42 || fail=1
        done
    fi
fi

echo
if [ "$fail" = 0 ]; then
    echo "parity battery PASSED — artifacts in $OUT/"
else
    echo "parity battery had FAILURES — bisect with tools/debug_decoder.py"
    echo "--substeps N --diff (sub-op granularity) and $OUT/stages.npz"
fi
exit $fail

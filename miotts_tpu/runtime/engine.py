"""TTS synthesis engine: text -> speech tokens -> codec -> PCM.

The TPU-native counterpart of the reference orchestrator
(`/root/reference/src/test-to-speech.{h,cpp}`), preserving its behavioral
contract — prompt format, normalization, token->code mapping, decode math,
peak-norm rule, streaming commit-holdback + crossfade policy, profile
fields — while replacing its architecture:

  * One persistent engine; models load once into HBM.  (The reference
    creates/destroys a llama_context per request, `test-to-speech.cpp:108`.)
  * Prefill and codec lengths are bucketed so every request shape hits a
    cached XLA executable.
  * Sampled tokens map to codec codes through a device-side int table
    (text/tokens.py) — the detokenize round-trip exists only for token-text
    output and --skip-llm replay.
  * Streaming keeps the reference's quality-first full-prefix re-decode
    (`test-to-speech.cpp:526-528`) but the re-decode runs in padded buckets,
    so the O(T^2) scan reuses one compiled codec executable per bucket.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader, load_voice_embedding
from ..models.codec import CodecConfig, codec_decode_spec, load_codec_params
from ..models.llm import (
    LLMConfig, init_kv_cache, llm_decode_step, llm_forward,
    llm_generate_chunk, llm_generate_chunk_spec, llm_prefill,
    load_llm_params, sample_token,
)
from ..ops.istft import spec_to_audio_bucketed
from ..text import build_prompt, normalize_tts_text, parse_speech_tokens
from ..text.tokenizer import Tokenizer
from .profile import StreamProfile

# StreamCallback(samples_or_None, sample_rate, is_last) -> keep_going
StreamCallback = Callable[[Optional[np.ndarray], int, bool], bool]


@partial(jax.jit,
         static_argnames=("llm_cfg", "codec_cfg", "n_steps", "code_bucket",
                          "holdback", "min_step", "win_slide", "final_flush",
                          "first_commit"),
         donate_argnames=("cache", "codes_buf"))
def _fused_stream_step(llm_params, codec_params, last_logits, cache, key,
                       temperature, stop_ids, code_table, codes_buf, n_codes,
                       committed, stopped, n_tokens, max_toks, voice_emb,
                       llm_cfg, codec_cfg, n_steps: int, code_bucket: int,
                       holdback: int, min_step: int, win_slide: bool = False,
                       final_flush: bool = False, first_commit: int = -1):
    """One streaming step, fully fused into a single executable: generate a
    chunk of tokens (on-device while_loop), append their codec codes to the
    device-resident code buffer, evaluate the commit-holdback policy
    (test-to-speech.cpp:507-522) on device, and — under `lax.cond`, in the
    SAME program — run the codec re-decode when the policy fires.

    Why: on this runtime, alternating between the LLM-chunk executable and
    the codec executable costs ~70-100 ms of program switching per emit
    (measured), tripling streaming cost; fusing them keeps one resident
    program.  The audio output is only transferred when the host actually
    emits (async dispatch — jax keeps it on device otherwise).

    ALL loop-control state lives on device (`stopped` stop-token latch,
    `n_tokens`/`max_toks` budget, `committed` commit watermark, and — with
    `win_slide` — the sliding-window buffer drop), so the host can dispatch
    chunk k+1 BEFORE reading chunk k's results: a 2-deep dispatch pipeline
    that hides the host<->device round-trip per chunk (see _stream_fused).
    A step dispatched after the stream already stopped is a no-op (the
    while_loop exits immediately and the policy cannot fire).

    Returns (tok_buf [n_steps], n_gen, stopped, last_logits, cache, key,
    codes_buf, n_codes, committed, n_tokens, do_emit, begin, target, flush,
    audio [code_bucket * spt]); begin/target are code indices into the
    decoded window for the host's emit range; `flush` signals the
    device-side final flush covering [target-or-begin, n_codes).
    """
    if win_slide:
        # sliding-window mode: drop already-committed codes from the FRONT
        # of the fixed-size buffer when the coming chunk would overflow it
        # (device analog of the host slide; the policy bounds uncommitted
        # codes by holdback+min_step-1+chunk, so the clamp never binds with
        # the warmup's bucket sizing).
        d = jnp.clip(n_codes + n_steps - code_bucket, 0, committed)
        codes_buf = jnp.roll(codes_buf, -d)
        n_codes = n_codes - d
        committed = committed - d

    buf0 = jnp.full((n_steps,), -1, jnp.int32)

    def cond_fn(carry):
        i, stopped, last, cache, key, buf, codes_buf, n_codes, n_tok = carry
        return (i < n_steps) & jnp.logical_not(stopped) & (n_tok < max_toks)

    def body(carry):
        i, stopped, last, cache, key, buf, codes_buf, n_codes, n_tok = carry
        key, sub = jax.random.split(key)
        tok = sample_token(last, temperature, sub)
        is_stop = jnp.any(tok[0] == stop_ids)
        buf = jnp.where(is_stop, buf, buf.at[i].set(tok[0]))
        code = code_table[jnp.clip(tok[0], 0, code_table.shape[0] - 1)]
        write = (~is_stop) & (code >= 0) & (n_codes < code_bucket)
        codes_buf = jnp.where(write, codes_buf.at[n_codes].set(code), codes_buf)
        n_codes = n_codes + write.astype(jnp.int32)

        def step(args):
            last, cache = args
            return llm_decode_step(llm_params, tok, cache, llm_cfg)

        last, cache = jax.lax.cond(is_stop, lambda a: a, step, (last, cache))
        i = jnp.where(is_stop, i, i + 1)
        n_tok = jnp.where(is_stop, n_tok, n_tok + 1)
        return i, is_stop, last, cache, key, buf, codes_buf, n_codes, n_tok

    (i, stopped, last, cache, key, buf, codes_buf, n_codes, n_tokens) = \
        jax.lax.while_loop(
            cond_fn, body,
            (jnp.int32(0), stopped, last_logits, cache, key, buf0,
             codes_buf, n_codes, n_tokens))

    # commit-holdback policy on device.  Reference cadence: emission only
    # after FULL chunks (test-to-speech.cpp:608) — partial chunks (stop /
    # budget) defer to the final flush, hence the (i == n_steps) gate.
    # first emission uses the (smaller) first_commit threshold so audio
    # starts one check interval earlier; later commits keep min_step.
    # first_commit <= min_step (caller-clamped), so the k_codes transfer
    # bound below still holds.
    fc = min_step if first_commit < 0 else min(first_commit, min_step)
    target = jnp.maximum(n_codes - holdback, 0)
    min_eff = jnp.where(committed == 0, fc, min_step)
    do_emit = (i == n_steps) & (n_codes > 0) & (target > committed) & \
        ((target - committed) >= min_eff)
    begin = committed
    committed = jnp.where(do_emit, target, committed)

    if final_flush:
        # Device-side final flush (full mode only — the device buffer holds
        # the whole prefix): when the stream just ended (stop token or token
        # budget), flush [committed, n_codes) with NO holdback, in the SAME
        # decode the policy emit uses (maybe_emit(true),
        # test-to-speech.cpp:616-617).  Saves the separate host flush path
        # and its program switches on the last chunk.
        final = stopped | (n_tokens >= max_toks)
        flush = final & (n_codes > committed)
        committed = jnp.where(flush, n_codes, committed)
    else:
        flush = jnp.bool_(False)

    spt = codec_cfg.samples_per_token

    def decode(_):
        lm, ph = codec_decode_spec(codec_params, codes_buf, voice_emb,
                                   codec_cfg, n_real=n_codes)
        return spec_to_audio_bucketed(
            lm, ph, codec_params["istft_cos_basis"],
            codec_params["istft_sin_basis"], codec_params["istft_hann"],
            codec_cfg.hop_length, codec_cfg.total_upsample, n_codes)

    audio = jax.lax.cond(
        do_emit | flush, decode,
        lambda _: jnp.zeros((code_bucket * spt,), jnp.float32), None)
    # Small transfer window: everything this step can emit starts at `begin`
    # and spans at most holdback + min_step + n_steps codes (the policy
    # bounds uncommitted codes by holdback+min_step-1 after every full
    # chunk, +n_steps fresh ones).  The host materializes only this slice —
    # ~7x less host<->device traffic per emit than the full window buffer
    # (which stays available as outs[14] for the out-of-bound fallback).
    k_codes = holdback + min_step + n_steps
    padded = jnp.concatenate(
        [audio, jnp.zeros((k_codes * spt,), jnp.float32)])
    audio_slice = jax.lax.dynamic_slice(
        padded, (begin * spt,), (k_codes * spt,))
    return (buf, i, stopped, last, cache, key, codes_buf, n_codes, committed,
            n_tokens, do_emit, begin, target, flush, audio, audio_slice)


@partial(jax.jit,
         static_argnames=("llm_cfg", "codec_cfg", "n_steps", "code_bucket",
                          "holdback", "min_step", "first_commit"),
         donate_argnames=("cache", "codes_buf"))
def _fused_batch_step(llm_params, codec_params, last_logits, cache, active,
                      key, temperature, stop_ids, code_table, codes_buf,
                      n_codes, committed, n_tokens, max_toks, embs,
                      llm_cfg, codec_cfg, n_steps: int, code_bucket: int,
                      holdback: int, min_step: int, first_commit: int = -1):
    """Batched fused streaming step: the multi-slot analog of
    _fused_stream_step — batched chunk generation with per-slot stop/budget
    tracking and device-side code append, per-slot commit policy, and a
    single vmapped codec decode under `lax.cond` when ANY slot commits.
    One resident executable serves the whole continuous-batching loop.

    Shapes: last [B, V]; active bool [B]; codes_buf i32 [B, bucket];
    n_codes/committed/n_tokens/max_toks i32 [B]; embs [B, D].
    Returns (tok_buf [B, n_steps], active, last, cache, key, codes_buf,
    n_codes, n_tokens, emit [B], target [B], audio [B, bucket*spt]).
    """

    B = last_logits.shape[0]
    buf0 = jnp.full((B, n_steps), -1, jnp.int32)

    def cond_fn(carry):
        i, active, *_ = carry
        return jnp.logical_and(i < n_steps, jnp.any(active))

    def body(carry):
        (i, active, last, cache, key, buf, codes_buf, n_codes,
         n_tokens) = carry
        if key.ndim == 2:   # per-slot keys: advance only while active
            splits = jax.vmap(jax.random.split)(key)          # [B, 2, 2]
            sub = splits[:, 1]
            key = jnp.where(active[:, None], splits[:, 0], key)
        else:
            key, sub = jax.random.split(key)
        tok = sample_token(last, temperature, sub)            # [B]
        is_stop = jnp.any(tok[:, None] == stop_ids[None, :], axis=-1)
        active = active & (~is_stop) & (n_tokens < max_toks)
        buf = buf.at[:, i].set(jnp.where(active, tok, -1))
        n_tokens = n_tokens + active.astype(jnp.int32)

        code = code_table[jnp.clip(tok, 0, code_table.shape[0] - 1)]
        slot_pos = jnp.minimum(n_codes, code_bucket - 1)
        write = active & (code >= 0) & (n_codes < code_bucket)
        cur = codes_buf[jnp.arange(B), slot_pos]
        codes_buf = codes_buf.at[jnp.arange(B), slot_pos].set(
            jnp.where(write, code, cur))
        n_codes = n_codes + write.astype(jnp.int32)

        fill = cache["fill"]
        s_max = cache["k"].shape[3]
        pos = jnp.where(active, fill, s_max - 1)[:, None]
        logits, cache = llm_forward(llm_params, tok[:, None], pos, cache,
                                    llm_cfg, advance=active.astype(jnp.int32))
        cache = dict(cache, fill=jnp.where(active, fill + 1, fill))
        return (i + 1, active, logits[:, 0], cache, key, buf, codes_buf,
                n_codes, n_tokens)

    (i, active, last, cache, key, buf, codes_buf, n_codes, n_tokens) = \
        jax.lax.while_loop(cond_fn, body,
                           (jnp.int32(0), active, last_logits, cache, key,
                            buf0, codes_buf, n_codes, n_tokens))

    fc = min_step if first_commit < 0 else min(first_commit, min_step)
    target = jnp.maximum(n_codes - holdback, 0)
    min_eff = jnp.where(committed == 0, fc, min_step)   # per-slot
    emit = active & (n_codes > 0) & (target > committed) & \
        ((target - committed) >= min_eff)

    spt = codec_cfg.samples_per_token

    def decode(_):
        def one(c, e, n):
            lm, ph = codec_decode_spec(codec_params, c, e, codec_cfg, n_real=n)
            return spec_to_audio_bucketed(
                lm, ph, codec_params["istft_cos_basis"],
                codec_params["istft_sin_basis"], codec_params["istft_hann"],
                codec_cfg.hop_length, codec_cfg.total_upsample, n)
        return jax.vmap(one)(codes_buf, embs, n_codes)

    audio = jax.lax.cond(
        jnp.any(emit), decode,
        lambda _: jnp.zeros((B, code_bucket * spt), jnp.float32), None)
    return (buf, active, last, cache, key, codes_buf, n_codes, n_tokens,
            emit, target, audio)


@partial(jax.jit, static_argnames=("cfg", "emit_len", "to_i16"))
def _codec_audio_sliced_vmapped(params, codes_b, embs_b, cfg, n_real_b,
                                starts_b, emit_len: int,
                                to_i16: bool = False):
    """Batched codec decode returning ONLY each stream's emission slice:
    audio[b, starts[b] : starts[b] + emit_len].

    Full batched audio is [B, bucket*spt] — 58 MB at B=64/T=128 — and the
    relay-tunneled device->host link moves ~66 MB/s, so materializing the
    whole buffer costs ~0.9 s while the decode itself computes in ~0.13 s
    (benchmarks: batcher stage timers + /tmp transfer probe).  A commit
    emits only ~chunk_steps codes per stream, so slicing on device cuts
    the transfer by the window/commit ratio (~6x).  `starts_b` must be
    pre-clamped to [0, total - emit_len]."""
    lm, ph = jax.vmap(
        lambda c, e, n: codec_decode_spec(params, c, e, cfg, n_real=n),
        in_axes=(0, 0, 0))(codes_b, embs_b, n_real_b)
    audio = jax.vmap(
        lambda l, p, n: spec_to_audio_bucketed(
            l, p, params["istft_cos_basis"], params["istft_sin_basis"],
            params["istft_hann"], cfg.hop_length, cfg.total_upsample, n),
        in_axes=(0, 0, 0))(lm, ph, n_real_b)
    out = jax.vmap(
        lambda a, s: jax.lax.dynamic_slice(a, (s,), (emit_len,)))(
            audio, starts_b)
    if to_i16:
        # int16 wire format: every sink is 16-bit PCM anyway (WAV writer,
        # playback, HTTP streaming), so quantizing on device halves the
        # transfer losslessly end-to-end.  Same scale-then-clamp-then-
        # truncate semantics as audio.wav.f32_to_s16 (wav-writer.cpp:39-42;
        # XLA float->int converts toward zero like the C++ cast)
        out = jnp.clip(out * 32767.0, -32768, 32767).astype(jnp.int16)
    return out


@partial(jax.jit, static_argnames=("new_len",))
def _grow_buf(buf, new_len: int):
    """Grow a device code buffer in place (full-mode bucket growth) — a
    device-only op, so the dispatch pipeline never has to drain or upload
    the host mirror at a rebucket point."""
    return jnp.zeros((new_len,), buf.dtype).at[:buf.shape[0]].set(buf)


def _sync(x) -> None:
    """Force completion of the computation producing `x` before returning.
    On the relay-tunneled TPU runtime `block_until_ready` can return BEFORE
    execution finishes (measured; CLAUDE.md), which would misattribute
    stage timings to the next synchronous fetch — fetching one element
    cannot return early.  Costs one tiny device->host transfer, so it is
    only used on profile-gated paths."""
    jax.device_get(x.ravel()[0])


def _round_up(x: int, m: int) -> int:
    return max(m, (x + m - 1) // m * m)


def _bucket_len(n: int, min_bucket: int) -> int:
    """Geometric (power-of-2) length bucket: compile count stays O(log n)
    over a whole utterance; codec compute is tiny so padding waste is
    irrelevant next to an XLA recompile."""
    b = min_bucket
    while b < n:
        b *= 2
    return b


@dataclass
class EngineConfig:
    """Engine-level knobs (reference defaults: `main.cpp:15-16`,
    `test-to-speech.cpp:364,499-501`)."""
    model_path: str = ""
    codec_path: str = ""
    temperature: float = 0.8
    max_tokens: int = 700
    seed: int = 42
    n_ctx: int = 2048
    # streaming policy
    stream_check_interval: int = 20
    holdback_codes: int = 32
    min_commit_step_codes: int = 24
    # Smaller commit threshold for a stream's FIRST emission only: the
    # 32-code holdback (quality contract) still applies, but the first
    # commit goes out once holdback + first_commit codes exist instead of
    # holdback + min_commit (56) — one full check interval earlier, which
    # is the time-to-first-audio lever at high slot counts.  8 is tuned to
    # the 20-token check cadence (first policy check with a committable
    # target is at 40 codes: target = 40-32 = 8).  Set equal to
    # min_commit_step_codes (or <=0) for the reference's uniform cadence.
    first_commit_codes: int = 8
    chunk_samples: int = 4096
    # bucketing granularity (TPU-specific; compile-cache keys)
    prompt_bucket: int = 64
    code_bucket: int = 32
    llm_dtype: str = "bfloat16"
    quantized_kv: bool = False   # int8 KV cache (north-star extension)
    # Speculative decoding (beyond-reference: llama.cpp upstream ships it as
    # examples/speculative; the reference itself is draft-less).  A small
    # draft model (e.g. MioTTS-0.1B for a 2.6B target — same tokenizer and
    # vocab across the family) proposes `spec_tokens` tokens per round and
    # ONE target forward verifies them all, amortizing the HBM-bound M=1
    # weight read over up to spec_tokens+1 tokens.  Output distribution is
    # EXACT (spec_accept); at temperature <= 0 output is token-for-token
    # identical to plain greedy decoding.  Uses the unfused streaming path.
    draft_model_path: str = ""
    spec_tokens: int = 6
    # Fused streaming: run chunk generation + commit policy + codec decode
    # in ONE executable (avoids per-emit program switching, ~2.3 ms/token on
    # this runtime).  Stage timing note: the codec share of fused steps is
    # folded into llm_sec; codec_sec/istft_sec then cover the final flush.
    fused_streaming: bool = True
    # Fused-step dispatch pipelining: with all loop-control state on device
    # (stop latch, token budget, commit watermark, window slide), chunk k+1
    # is dispatched before chunk k's results are read; depth 2 hides the
    # per-chunk host<->device round-trip behind device compute.  1 = fully
    # synchronous (for A/B measurement).
    stream_pipeline_depth: int = 2
    # Sliding-window streaming re-decode (0 = off).  The reference re-decodes
    # the FULL prefix every emit ("quality-first", test-to-speech.cpp:526-528)
    # — O(T^2) over an utterance.  With a window W > 0 only the last W codes
    # are re-decoded per emit: O(T) total.  The codec is built from local ops
    # (window-65 banded attention with relative RoPE, convs), so a window
    # gives every committed code >= W-minus-pending codes of left context and
    # the usual 32-code holdback of right context; the only approximation is
    # the GroupNorm statistics window — the same class of drift the
    # reference's own prefix re-decode already has vs offline decode (its
    # stream-compare tool measures RMSE, not exactness).  The final flush
    # stays a full-prefix decode.
    stream_window_codes: int = 0
    # Codec/iSTFT-vs-LLM pipelining (SURVEY.md §2.3): place the codec on a
    # different device (`codec_device` = jax.devices() index, -1 = same) and
    # defer each emit's audio materialization by one check interval
    # (`pipeline_codec`), so the codec decode runs on its device WHILE the
    # next LLM chunk runs on the LLM device.  Audio is delivered one check
    # interval later; the commit policy and audio content are unchanged
    # (tests assert sample-exact parity with the unpipelined path).  Uses the
    # unfused streaming path (the fused step is a single program and cannot
    # span devices).
    codec_device: int = -1
    # Tri-state (round 3): None = AUTO — ON for the batched serving path
    # (the only 64-stream config that cleared TTFA < 1 s: i16+pipelined
    # measured 94.9x aggregate / 0.97 s p50 vs 80-84x / 1.4 s without,
    # benchmarks/matrix_r2/queue4.out), OFF for the single-stream engine
    # (whose fused step is faster than pipelining and whose parity paths
    # stay float-exact).  Explicit True/False overrides both paths.
    pipeline_codec: bool | None = None
    # bf16-input codec matmuls (CodecConfig.fast): ~3x MXU throughput at
    # ~1e-3 relative audio error — far below the codec's own quantization
    # noise.  Default off so parity paths stay exact-f32; serving benches
    # turn it on.
    codec_fast: bool = False
    # int16 wire format for batched emission slices: halves the
    # device->host transfer (the measured serving codec cost); every sink
    # is 16-bit PCM anyway, so end-to-end it is lossless (one extra
    # round-trip quantization vs the float path, <= 1/32767 per sample).
    # Tri-state like pipeline_codec: None = AUTO (ON for batched serving,
    # where it is half of the measured-best 94.9x/0.97s config; the
    # single-stream float paths are unaffected — they do not use the
    # sliced batch transfers).  Explicit False keeps batched emission
    # float-exact for parity tests.
    i16_transfer: bool | None = None

    @property
    def serving_pipeline_codec(self) -> bool:
        """pipeline_codec resolved for the BATCHED serving path (None ->
        True: the measured-best default)."""
        return True if self.pipeline_codec is None else bool(self.pipeline_codec)

    @property
    def serving_i16_transfer(self) -> bool:
        """i16_transfer resolved for the batched sliced transfers (None ->
        True: the measured-best default)."""
        return True if self.i16_transfer is None else bool(self.i16_transfer)


@dataclass
class Options:
    """Per-call overrides (negative sentinel = engine default), mirroring
    `TestToSpeech::Options` (`test-to-speech.h:49-54`)."""
    temperature: float = -1.0
    max_tokens: int = -1
    skip_llm: bool = False
    apply_peak_normalization: bool = True
    seed: int = -1


class VoiceModel:
    """Voice embedding holder (`test-to-speech.h:11-24`)."""

    def __init__(self, path: str | None = None, embedding: np.ndarray | None = None):
        self.path = path or ""
        self.embedding = None
        self._dev_emb = None
        if embedding is not None:
            self.embedding = np.asarray(embedding, np.float32)
        elif path:
            self.embedding = load_voice_embedding(path)

    def device_embedding(self):
        """Device-resident copy of the embedding, uploaded once (transfer
        latency on a relay-tunneled chip is per-transfer, not per-byte)."""
        if self._dev_emb is None:
            self._dev_emb = jnp.asarray(self.embedding, jnp.float32)
        return self._dev_emb

    @property
    def is_ready(self) -> bool:
        return self.embedding is not None and self.embedding.size > 0


class TTSEngine:
    def __init__(self, config: EngineConfig):
        self.config = config
        # effective first-commit threshold: <=0 disables the early first
        # emission (reference-uniform cadence); never above min_commit
        self._first_commit = (
            min(config.first_commit_codes, config.min_commit_step_codes)
            if config.first_commit_codes > 0
            else config.min_commit_step_codes)
        self.llm_params = None
        self.llm_cfg: LLMConfig | None = None
        self.tokenizer: Tokenizer | None = None
        self.code_table: np.ndarray | None = None
        self._speech_table_dev = None

        if config.model_path:
            with GGUFReader(config.model_path) as r:
                self.llm_cfg = LLMConfig.from_gguf(r)
                dtype = jnp.bfloat16 if config.llm_dtype == "bfloat16" else jnp.float32
                self.llm_params, _ = load_llm_params(r, self.llm_cfg, dtype=dtype)
                self.tokenizer = Tokenizer.from_gguf(r)
            self.code_table = self.tokenizer.speech_code_table()
            self._speech_table_dev = jnp.asarray(self.code_table)
            self._im_end_id = self.tokenizer.token_to_id.get("<|im_end|>", -1)
            self._eos_id = self.tokenizer.eos_id
            self._stop_ids_dev = jnp.asarray([self._eos_id, self._im_end_id],
                                             jnp.int32)

        self.draft_params = None
        self.draft_cfg: LLMConfig | None = None
        self._dcache = None
        self._spec_stats: dict | None = None
        if (config.model_path and config.draft_model_path
                and config.spec_tokens > 0):
            with GGUFReader(config.draft_model_path) as r:
                self.draft_cfg = LLMConfig.from_gguf(r)
                dtype = (jnp.bfloat16 if config.llm_dtype == "bfloat16"
                         else jnp.float32)
                self.draft_params, _ = load_llm_params(r, self.draft_cfg,
                                                       dtype=dtype)
            if self.draft_cfg.n_vocab != self.llm_cfg.n_vocab:
                raise ValueError(
                    f"draft vocab ({self.draft_cfg.n_vocab}) != target vocab "
                    f"({self.llm_cfg.n_vocab}) — speculative decoding needs "
                    f"a same-tokenizer draft (the MioTTS family qualifies)")
            if self.llm_cfg.layer_types or self.draft_cfg.layer_types:
                # hybrid (LFM2) short-conv state advances on every forward
                # and cannot be rewound by the fill-based rollback: a
                # rejected draft would permanently corrupt the conv state
                raise ValueError(
                    "speculative decoding supports dense attention models "
                    "only (hybrid LFM2 conv state cannot roll back)")

        codec_reader = GGUFReader(config.codec_path)
        self.codec_params, self.codec_cfg = load_codec_params(codec_reader)
        codec_reader.close()
        if config.codec_fast:
            import dataclasses
            self.codec_cfg = dataclasses.replace(self.codec_cfg, fast=True)
        if config.codec_device >= 0:
            devs = jax.devices()
            self.codec_params = jax.device_put(
                self.codec_params, devs[min(config.codec_device,
                                            len(devs) - 1)])
        self.sample_rate = self.codec_cfg.sample_rate
        self.samples_per_token = self.codec_cfg.samples_per_token
        # Persistent single-stream KV cache (the reference allocates a fresh
        # llama_context per request, test-to-speech.cpp:108; we reuse one
        # donated buffer and just reset the fill count).
        self._cache = None

    @property
    def is_ready(self) -> bool:
        return self.codec_params is not None

    def warmup(self, max_codes: int | None = None,
               prompt_len: int = 64) -> None:
        """Precompile every executable a synthesis run will hit: the prefill
        bucket, the decode chunk loop, and ALL codec length buckets up to
        `max_codes`.  Keeps compiles out of serving latency (and out of
        time-to-first-audio); the reference has no analog because ggml
        rebuilds its graph every call anyway (`miocodec.cpp:558`)."""
        import os
        import sys
        verbose = bool(os.environ.get("MIOTTS_WARMUP_VERBOSE"))
        _tprev = [time.perf_counter()]

        def _mark(label: str) -> None:
            if verbose:
                now = time.perf_counter()
                print(f"warmup: {label}: {now - _tprev[0]:.1f}s",
                      file=sys.stderr, flush=True)
                _tprev[0] = now

        cfgc = self.codec_cfg
        emb = jnp.zeros((cfgc.adaln_dim,), jnp.float32)
        if max_codes is None:
            max_codes = self.config.max_tokens
        buckets = []
        b = self.config.code_bucket
        while True:
            buckets.append(b)
            if b >= max_codes:
                break
            b *= 2
        for T in buckets:
            codes = jnp.zeros((T,), jnp.int32)
            n_real = jnp.asarray(min(T, max_codes), jnp.int32)
            lm, ph = codec_decode_spec(self.codec_params, codes, emb, cfgc,
                                       n_real=n_real)
            audio = spec_to_audio_bucketed(
                lm, ph, self.codec_params["istft_cos_basis"],
                self.codec_params["istft_sin_basis"],
                self.codec_params["istft_hann"],
                cfgc.hop_length, cfgc.total_upsample, n_real)
            audio.block_until_ready()
            _mark(f"codec bucket T={T}")
        if self.llm_params is not None:
            cfg = self.llm_cfg
            dtype = (jnp.bfloat16 if self.config.llm_dtype == "bfloat16"
                     else jnp.float32)
            bucket_p = _round_up(prompt_len, self.config.prompt_bucket)
            # same cache-size bucket rule as generate_tokens
            s_cache = min(_bucket_len(bucket_p + self.config.max_tokens + 64, 256),
                          self.config.n_ctx)
            cache = init_kv_cache(cfg, 1, s_cache, dtype=dtype,
                                  quantized=self.config.quantized_kv)
            toks = jnp.zeros((1, bucket_p), jnp.int32)
            last, cache = llm_prefill(self.llm_params, toks,
                                      jnp.asarray([8], jnp.int32), cache, cfg)
            _sync(last)
            _mark(f"llm prefill bucket={bucket_p}")
            stop_ids = jnp.asarray([-1, -1], jnp.int32)
            # Interleave chunk and codec executions like a real stream does:
            # alternating programs exercises the device's program switching
            # path too, not just each executable in isolation.
            emb_w = jnp.zeros((cfgc.adaln_dim,), jnp.float32)
            for chunk in sorted({self.config.stream_check_interval, 64}):
                # cache is donated through the chunk call; rethread it
                buf, _, _, last, cache, _ = llm_generate_chunk(
                    self.llm_params, last, cache, jax.random.PRNGKey(0),
                    jnp.float32(1.0), stop_ids, cfg, chunk)
                buf.block_until_ready()
                codes_w = jnp.zeros((self.config.code_bucket,), jnp.int32)
                lm, ph = codec_decode_spec(
                    self.codec_params, codes_w, emb_w, cfgc,
                    n_real=jnp.asarray(1, jnp.int32))
                lm.block_until_ready()
                _mark(f"llm chunk={chunk} + codec interleave")
            if self.draft_params is not None:
                # speculative path: draft prefill + the spec chunk at both
                # cadences (stream check interval / offline 64), with the
                # same spec-headroom cache bucket generate_tokens will use
                dcfg = self.draft_cfg
                need_s = (bucket_p + self.config.max_tokens + 64
                          + self.config.spec_tokens + 8)
                s_cache_s = min(_bucket_len(need_s, 256), self.config.n_ctx)
                if s_cache_s != s_cache:
                    cache = init_kv_cache(cfg, 1, s_cache_s, dtype=dtype,
                                          quantized=self.config.quantized_kv)
                    last, cache = llm_prefill(self.llm_params, toks,
                                              jnp.asarray([8], jnp.int32),
                                              cache, cfg)
                dcache = init_kv_cache(dcfg, 1, s_cache_s, dtype=dtype,
                                       quantized=self.config.quantized_kv)
                _, dcache = llm_prefill(self.draft_params, toks,
                                        jnp.asarray([8], jnp.int32),
                                        dcache, dcfg)
                K = max(1, self.config.spec_tokens)
                pending = jnp.zeros((1,), jnp.int32)
                for chunk in sorted({self.config.stream_check_interval, 64}):
                    out = llm_generate_chunk_spec(
                        self.llm_params, self.draft_params, pending, cache,
                        dcache, jax.random.PRNGKey(0), jnp.float32(1.0),
                        stop_ids, cfg, dcfg, chunk, K,
                        force_p=self._spec_force_p())
                    out[0].block_until_ready()
                    pending, cache, dcache = out[3], out[4], out[5]
                    _mark(f"spec chunk={chunk} (k={K})")
            if self.config.fused_streaming and self.draft_params is None:
                # precompile the fused streaming step: one bucket per
                # geometric length in full mode; a single fixed bucket in
                # sliding-window mode
                chunk = self.config.stream_check_interval
                if self.config.stream_window_codes > 0:
                    keep = max(self.config.stream_window_codes,
                               self.config.holdback_codes
                               + self.config.min_commit_step_codes + chunk)
                    buckets_f = [_bucket_len(keep + chunk,
                                             self.config.code_bucket)]
                else:
                    buckets_f = []
                    b = _bucket_len(chunk, self.config.code_bucket)
                    while True:
                        buckets_f.append(b)
                        if b >= max_codes:
                            break
                        b *= 2
                for bi, b in enumerate(buckets_f):
                    if bi > 0:
                        # precompile the in-place device bucket growth the
                        # serving loop uses between these sizes
                        _grow_buf(jnp.zeros((buckets_f[bi - 1],), jnp.int32),
                                  b).block_until_ready()
                    codes_buf = jnp.zeros((b,), jnp.int32)
                    out = _fused_stream_step(
                        self.llm_params, self.codec_params, last, cache,
                        jax.random.PRNGKey(0), jnp.float32(1.0), stop_ids,
                        self._speech_table_dev, codes_buf, jnp.int32(0),
                        jnp.int32(0), jnp.bool_(False), jnp.int32(0),
                        jnp.int32(1 << 30), emb_w, cfg, cfgc, chunk, b,
                        self.config.holdback_codes,
                        self.config.min_commit_step_codes,
                        self.config.stream_window_codes > 0,
                        not self.config.stream_window_codes > 0,
                        self._first_commit)
                    out[0].block_until_ready()
                    _mark(f"fused stream step bucket={b}")
                    last, cache = out[3], out[4]
            self._cache = cache

    def attribute_stages(self, profile: StreamProfile,
                         reps: int = 8) -> StreamProfile:
        """Device-measured codec/iSTFT stage split for a fused-streaming
        profile (restores the reference's per-stage observability contract,
        `stream-benchmark.cpp:163-166`, which the fused step otherwise
        degrades: its single executable folds codec+iSTFT time into
        llm_sec).  Times the standalone codec-decode and iSTFT executables
        (compiled by warmup) at each decode call's bucket length, then moves
        that measured time from llm_sec into codec_sec/istft_sec.  Runs
        AFTER a timed stream so the measurement never pollutes serving
        latency."""
        if profile.stages_calibrated or not profile.decode_bucket_codes:
            return profile
        from collections import Counter
        cfgc = self.codec_cfg
        emb = jnp.zeros((cfgc.adaln_dim,), jnp.float32)
        counts = Counter(profile.decode_bucket_codes)
        codec_total = 0.0
        istft_total = 0.0

        def marginal(fn) -> float:
            """Per-execution DEVICE time of `fn`, with the fixed dispatch /
            relay round-trip cancelled: time reps and 2*reps back-to-back
            dispatches (one scalar-fetch fence each — block_until_ready
            returns early on this relay) and take the difference.  Inside
            the fused executable there is no per-call dispatch, so the
            marginal cost is the honest share to move."""
            out = fn()
            _sync(out)                       # warm (compile-cache hit)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            _sync(out)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(2 * reps):
                out = fn()
            _sync(out)
            t2 = time.perf_counter() - t0
            return max(0.0, (t2 - t1) / reps)

        def measured(fn) -> float:
            # host timing noise (a loaded machine) can drive the marginal
            # difference to zero; retry with more reps before accepting it —
            # a zero share would falsely report the stage as free.  If the
            # escalated retry ALSO reads zero, flag the whole split as
            # untrusted (profile.stages_trusted) so consumers can say so.
            dt = marginal(fn)
            if dt <= 0.0:
                nonlocal reps
                reps *= 4
                try:
                    dt = marginal(fn)
                finally:
                    reps //= 4
                if dt <= 0.0:
                    profile.stages_trusted = False
            return dt

        for b, n_calls in sorted(counts.items()):
            codes = jnp.zeros((b,), jnp.int32)
            n_real = jnp.asarray(b, jnp.int32)
            lm, ph = codec_decode_spec(self.codec_params, codes, emb, cfgc,
                                       n_real=n_real)
            codec_dt = measured(lambda: codec_decode_spec(
                self.codec_params, codes, emb, cfgc, n_real=n_real)[0])
            istft_dt = measured(lambda: spec_to_audio_bucketed(
                lm, ph, self.codec_params["istft_cos_basis"],
                self.codec_params["istft_sin_basis"],
                self.codec_params["istft_hann"],
                cfgc.hop_length, cfgc.total_upsample, n_real))
            codec_total += codec_dt * n_calls
            istft_total += istft_dt * n_calls
        moved = codec_total + istft_total
        cap = 0.9 * profile.llm_sec
        if moved > cap > 0:
            # the standalone measurement exceeded what the fused loop can
            # possibly contain — residual noise; scale down but never zero
            # the LLM share (the chunk generation is certainly not free)
            scale = cap / moved
            codec_total *= scale
            istft_total *= scale
            moved = cap
        elif profile.llm_sec <= 0:
            return profile
        profile.llm_sec -= moved
        profile.codec_sec += codec_total
        profile.istft_sec += istft_total
        profile.stages_calibrated = True
        return profile

    # ------------------------------------------------------------------
    # LLM: speech-token generation
    # ------------------------------------------------------------------

    def _resolve(self, options: Options) -> tuple[float, int, int]:
        temp = options.temperature if options.temperature >= 0 else self.config.temperature
        max_tok = options.max_tokens if options.max_tokens > 0 else self.config.max_tokens
        seed = options.seed if options.seed >= 0 else self.config.seed
        return temp, max_tok, seed

    def generate_tokens(self, text: str, options: Options = Options(),
                        on_token=None, profile: StreamProfile | None = None
                        ) -> list[int]:
        """Autoregressive generation of LLM token ids for `text`
        (run_llm equivalent, `test-to-speech.cpp:94-199`).  `on_token(tid,
        n_generated)` is called per token and may return False to stop."""
        if self.llm_params is None or self.tokenizer is None:
            raise RuntimeError("LLM model is not loaded")
        temp, max_tok, seed = self._resolve(options)
        cfg = self.llm_cfg

        prompt = build_prompt(normalize_tts_text(text))
        ids = self.tokenizer.encode(prompt, add_special=True, parse_special=True)
        n = len(ids)
        if n + max_tok > self.config.n_ctx:
            max_tok = max(0, self.config.n_ctx - n)
        if self.draft_params is not None:
            # Speculative headroom at the context boundary (ADVICE r4): a
            # spec round writes up to fill + spec_tokens + 1 cache
            # positions before rollback, but s_cache is clamped to n_ctx —
            # without this reservation the verify's writes past S_max are
            # silently dropped near the cap and boundary tokens degrade.
            max_tok = max(0, min(max_tok, self.config.n_ctx - n
                                 - (self.config.spec_tokens + 1)))

        bucket = _round_up(n, self.config.prompt_bucket)
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = ids

        t0 = time.perf_counter()
        # Size the cache to a geometric bucket of prompt + budget (capped at
        # n_ctx): decode attention reads the WHOLE cache length every step,
        # so a 2048-slot cache for a 200-token utterance would waste ~10x
        # attention HBM traffic.
        need = bucket + max_tok + 64
        if self.draft_params is not None:
            # speculation overshoots by up to spec_tokens+1 per chunk
            need += self.config.spec_tokens + 8
        s_cache = min(_bucket_len(need, 256), self.config.n_ctx)
        if self._cache is None or self._cache["k"].shape[3] != s_cache:
            self._cache = init_kv_cache(
                cfg, 1, s_cache,
                dtype=jnp.bfloat16 if self.config.llm_dtype == "bfloat16"
                else jnp.float32,
                quantized=self.config.quantized_kv)
        cache = dict(self._cache, fill=jnp.zeros((1,), jnp.int32))
        last, cache = llm_prefill(self.llm_params, jnp.asarray(toks),
                                  jnp.asarray([n], jnp.int32), cache, cfg)
        if profile:
            _sync(last)
            profile.prefill_sec += time.perf_counter() - t0

        # Device-side chunked generation: the sample->stop-check->decode loop
        # runs in lax.while_loop chunks, so the host pays one dispatch per
        # `chunk` tokens instead of per token (the reference round-trips
        # every token, test-to-speech.cpp:164-192).  Chunk size equals the
        # streaming emit cadence so the commit policy is unchanged.
        chunk = self.config.stream_check_interval if on_token is not None else 64
        key = jax.random.PRNGKey(seed)
        temp_arr = jnp.float32(temp)
        stop_ids = jnp.asarray([self._eos_id, self._im_end_id], jnp.int32)
        if self.draft_params is not None and max_tok > 0:
            return self._spec_loop(toks, n, last, cache, key, temp_arr,
                                   stop_ids, chunk, max_tok, s_cache,
                                   on_token, profile)
        generated: list[int] = []
        n_gen = 0
        stopped = False
        while n_gen < max_tok and not stopped:
            t1 = time.perf_counter()
            buf, cnt, done, last, cache, key = llm_generate_chunk(
                self.llm_params, last, cache, key, temp_arr, stop_ids,
                cfg, chunk)
            buf = np.asarray(buf)
            cnt = int(cnt)
            if profile:
                profile.llm_sec += time.perf_counter() - t1
            take = min(cnt, max_tok - n_gen)
            stopped = bool(done) or take < cnt
            for j in range(take):
                tid = int(buf[j])
                generated.append(tid)
                n_gen += 1
                if profile:
                    profile.llm_tokens = n_gen
                if on_token is not None and not on_token(tid, n_gen):
                    self._cache = cache
                    return generated
        self._cache = cache
        return generated

    @staticmethod
    def _spec_force_p():
        """Runtime scalar for the spec forced-acceptance perf harness
        (MIOTTS_SPEC_FORCE_ACCEPT; NaN = disabled).  Passed as a traced
        ARGUMENT so every p value — and the real path — shares one
        compiled spec executable (remote compiles cost tens of minutes
        on this relay)."""
        import jax.numpy as jnp
        v = os.environ.get("MIOTTS_SPEC_FORCE_ACCEPT", "")
        return jnp.float32(float(v) if v else float("nan"))

    def _spec_loop(self, toks, n, last, cache, key, temp_arr, stop_ids,
                   chunk, max_tok, s_cache, on_token, profile) -> list[int]:
        """Draft-speculated generation loop (`llm_generate_chunk_spec`).

        The draft model prefills the same prompt, the first token is
        sampled host-side from the exact target dist, and each device chunk
        runs draft-propose / target-verify rounds.  Greedy output is
        token-for-token identical to the plain loop; at temperature > 0 the
        output DISTRIBUTION is exact but the sample stream differs (the
        PRNG is consumed per draft + per acceptance, not per token).
        Acceptance stats land in self._spec_stats."""
        dcfg = self.draft_cfg
        dtype = (jnp.bfloat16 if self.config.llm_dtype == "bfloat16"
                 else jnp.float32)
        if self._dcache is None or self._dcache["k"].shape[3] != s_cache:
            self._dcache = init_kv_cache(dcfg, 1, s_cache, dtype=dtype,
                                         quantized=self.config.quantized_kv)
        dcache = dict(self._dcache, fill=jnp.zeros((1,), jnp.int32))
        _, dcache = llm_prefill(self.draft_params, jnp.asarray(toks),
                                jnp.asarray([n], jnp.int32), dcache, dcfg)

        key, sub = jax.random.split(key)
        pending = sample_token(last, temp_arr, sub)        # exact target dist
        tid0 = int(pending[0])
        self._spec_stats = {"rounds": 0, "accepted": 0, "drafted": 0}
        generated: list[int] = []
        if tid0 in (self._eos_id, self._im_end_id):
            return generated
        generated.append(tid0)
        n_gen = 1
        if profile:
            profile.llm_tokens = n_gen
        if on_token is not None and not on_token(tid0, n_gen):
            return generated

        K = max(1, self.config.spec_tokens)
        force_p = self._spec_force_p()

        def dispatch(pending, cache, dcache, key):
            return llm_generate_chunk_spec(
                self.llm_params, self.draft_params, pending, cache, dcache,
                key, temp_arr, stop_ids, self.llm_cfg, dcfg, chunk, K,
                force_p=force_p)

        # Depth-2 dispatch pipeline (round 5): chunk k+1 is dispatched with
        # chunk k's LAZY output state (pending/caches/key stay on device)
        # BEFORE chunk k's token buffer is fetched, so the host fetch, the
        # token callbacks and the per-emit codec work all overlap chunk
        # k+1's device execution — the same latency-hiding the fused plain
        # step gets from stream_pipeline_depth.  The spec e2e measurement
        # (matrix_r5 spec_e2e_*) attributed ~3 ms/token to exactly this
        # serialized host glue.  One chunk may be over-dispatched at
        # stream end; its tokens are discarded and the donated caches are
        # only ever reused as reset buffers, so the waste is bounded by
        # one chunk's device time.
        stopped = False
        fut = dispatch(pending, cache, dcache, key)
        while True:
            t1 = time.perf_counter()
            (buf, cnt, done, pending, cache, dcache, key, rounds,
             accepted) = fut
            # over-dispatch the next chunk unless the budget is certainly
            # exhausted (buf carries at most chunk + K tokens per call)
            fut = None
            if n_gen + chunk + K < max_tok:
                fut = dispatch(pending, cache, dcache, key)
            buf = np.asarray(buf)
            cnt = int(cnt)
            if profile:
                profile.llm_sec += time.perf_counter() - t1
            self._spec_stats["rounds"] += int(rounds)
            self._spec_stats["accepted"] += int(accepted)
            self._spec_stats["drafted"] += int(rounds) * K
            take = min(cnt, max_tok - n_gen)
            stopped = bool(done) or take < cnt
            for j in range(take):
                tid = int(buf[j])
                generated.append(tid)
                n_gen += 1
                if profile:
                    profile.llm_tokens = n_gen
                if on_token is not None and not on_token(tid, n_gen):
                    stopped = True
                    break
            if stopped or n_gen >= max_tok:
                if fut is not None:
                    # consume the in-flight chunk's state: the previous
                    # cache/dcache handles were DONATED to it and must not
                    # be stored or read again
                    pending, cache, dcache, key = fut[3], fut[4], fut[5], fut[6]
                break
            if fut is None:
                fut = dispatch(pending, cache, dcache, key)
        self._cache = cache
        self._dcache = dcache
        return generated

    def generate_token_text(self, text: str, options: Options = Options()) -> str:
        """Token-text output (`generate_token_text`,
        `test-to-speech.cpp:641-651`)."""
        if options.skip_llm:
            return text
        ids = self.generate_tokens(text, options)
        return self.tokenizer.decode(ids)

    def tokens_to_codes(self, token_ids: list[int]) -> list[int]:
        """Sampled token ids -> codec codes via the int lookup table."""
        t = self.code_table
        return [int(t[i]) for i in token_ids if 0 <= i < len(t) and t[i] >= 0]

    # ------------------------------------------------------------------
    # Codec: codes -> audio (bucketed)
    # ------------------------------------------------------------------

    def decode_codes(self, codes: list[int] | np.ndarray, voice: VoiceModel,
                     apply_peak_normalization: bool = True,
                     profile: StreamProfile | None = None) -> np.ndarray:
        """codes -> float PCM; bucketed decode, exact output length
        T * samples_per_token (`decode_tokens_to_audio`,
        `test-to-speech.cpp:201-246`)."""
        if not voice.is_ready:
            raise RuntimeError("voice model is not ready")
        codes = np.asarray(codes, np.int32).reshape(-1)
        T = len(codes)
        if T == 0:
            return np.zeros(0, np.float32)
        bucket = _bucket_len(T, self.config.code_bucket)
        padded = np.zeros(bucket, np.int32)
        padded[:T] = codes
        emb = voice.device_embedding()
        cfg = self.codec_cfg

        n_real = jnp.asarray(T, jnp.int32)
        t0 = time.perf_counter()
        log_mag, phase = codec_decode_spec(
            self.codec_params, jnp.asarray(padded), emb, cfg, n_real=n_real)
        if profile:
            # only force the intermediate sync when stage timing is wanted
            _sync(log_mag)
        t1 = time.perf_counter()

        audio = spec_to_audio_bucketed(
            log_mag, phase,
            self.codec_params["istft_cos_basis"],
            self.codec_params["istft_sin_basis"],
            self.codec_params["istft_hann"],
            cfg.hop_length, cfg.total_upsample, n_real)
        audio = np.asarray(audio)[: T * cfg.samples_per_token]
        t2 = time.perf_counter()
        if profile:
            profile.codec_sec += t1 - t0
            profile.istft_sec += t2 - t1
            profile.decode_calls += 1
            profile.decoded_codes += T

        if apply_peak_normalization:
            peak = float(np.max(np.abs(audio))) if audio.size else 0.0
            if peak > 1e-8:
                audio = audio * (0.95 / peak)
        return audio.astype(np.float32)

    def decode_codes_async(self, codes, voice: VoiceModel):
        """Dispatch a bucketed codec+iSTFT decode WITHOUT materializing the
        result (JAX async dispatch; with `codec_device` set, it runs there
        while the caller keeps the LLM device busy).  Returns
        (audio_device_array, T) — slice the first T * samples_per_token
        samples after np.asarray()."""
        codes = np.asarray(codes, np.int32).reshape(-1)
        T = len(codes)
        bucket = _bucket_len(T, self.config.code_bucket)
        padded = np.zeros(bucket, np.int32)
        padded[:T] = codes
        emb = voice.device_embedding()
        cfg = self.codec_cfg
        n_real = jnp.asarray(T, jnp.int32)
        lm, ph = codec_decode_spec(self.codec_params, jnp.asarray(padded),
                                   emb, cfg, n_real=n_real)
        audio = spec_to_audio_bucketed(
            lm, ph, self.codec_params["istft_cos_basis"],
            self.codec_params["istft_sin_basis"],
            self.codec_params["istft_hann"],
            cfg.hop_length, cfg.total_upsample, n_real)
        return audio, T

    def decode_codes_batch_sliced_async(self, codes_list: list, voices: list,
                                        begins: list, ends: list):
        """Batched codec decode that dispatches ONLY each stream's emission
        slice [begins[i], ends[i]) (sample offsets relative to the decoded
        window).  The full batched audio buffer is ~58 MB at 64 slots and
        the relay link moves ~66 MB/s, so materializing whole windows costs
        ~0.9 s/round while the decode computes in ~0.13 s — the transfer,
        not the compute, was the serving codec cost.  Returns
        (audio_dev [B, E], offsets, n_samples): row i's samples are
        audio_dev[i, offsets[i] : offsets[i] + n_samples[i]]."""
        assert len(codes_list) == len(voices) == len(begins) == len(ends)
        cfg = self.codec_cfg
        spt = cfg.samples_per_token
        lens = [len(c) for c in codes_list]
        bucket = _bucket_len(max(lens), self.config.code_bucket)
        B_real = len(codes_list)
        # batch bucket: the committing-slot count varies round to round in
        # real traffic (staggered commits, partial waves), and an exact-B
        # jit key would compile a fresh executable for every distinct size
        # — pad with zero-length dummy rows instead (their emission slices
        # are empty; rows B_real.. are never read back).  Buckets: powers
        # of two up to 16, then multiples of 16 (exact at the measured
        # serving shapes 64/96/128; <=16% padding waste worst case)
        if B_real <= 16:
            B = 1
            while B < B_real:
                B *= 2
        else:
            B = _round_up(B_real, 16)
        padded = np.zeros((B, bucket), np.int32)
        embs = np.zeros((B, cfg.adaln_dim), np.float32)
        for i, (c, v) in enumerate(zip(codes_list, voices)):
            padded[i, :lens[i]] = np.asarray(c, np.int32)
            embs[i] = v.embedding
        total = bucket * spt
        n_samp = [max(0, min(int(e), lens[i] * spt) - int(b))
                  for i, (b, e) in enumerate(zip(begins, ends))]
        # emission-slice bucket: multiples of 8 codes of audio, O(1) jit keys
        E = min(_round_up(max(n_samp + [1]), 8 * spt), total)
        starts, offs = [], []
        for b in begins:
            s = max(0, min(int(b), total - E))
            starts.append(s)
            offs.append(int(b) - s)
        lens_arr = np.ones((B,), np.int32)
        lens_arr[:B_real] = lens
        starts_arr = np.zeros((B,), np.int32)
        starts_arr[:B_real] = starts
        audio = _codec_audio_sliced_vmapped(
            self.codec_params, jnp.asarray(padded), jnp.asarray(embs), cfg,
            jnp.asarray(lens_arr), jnp.asarray(starts_arr), E,
            self.config.serving_i16_transfer)
        return audio, offs, n_samp

    def decode_codes_batch_sliced(self, codes_list: list, voices: list,
                                  begins: list, ends: list,
                                  profile: StreamProfile | None = None) -> list:
        """Synchronous wrapper of decode_codes_batch_sliced_async: returns
        a list of float PCM arrays, exactly ends[i]-begins[i] samples each
        (clipped to the decoded length)."""
        t0 = time.perf_counter()
        audio, offs, n_samp = self.decode_codes_batch_sliced_async(
            codes_list, voices, begins, ends)
        a = np.asarray(audio)
        if a.dtype == np.int16:
            a = a.astype(np.float32) / 32767.0
        if profile:
            profile.codec_sec += time.perf_counter() - t0
            profile.decode_calls += 1
            profile.decoded_codes += sum(len(c) for c in codes_list)
        return [a[i, offs[i]:offs[i] + n_samp[i]] for i in range(len(offs))]

    def _stream_fused(self, voice: VoiceModel, text: str, emit_range,
                      timed_callback, options: Options,
                      profile: StreamProfile) -> bool:
        """Streaming via the fused single-executable step (see
        _fused_stream_step).  Policy-identical to the reference
        (test-to-speech.cpp:499-571); the final flush reuses the host codec
        path."""
        cfg = self.llm_cfg
        cfgc = self.codec_cfg
        cfgE = self.config
        temp, max_tok, seed = self._resolve(options)

        prompt = build_prompt(normalize_tts_text(text))
        ids = self.tokenizer.encode(prompt, add_special=True, parse_special=True)
        n = len(ids)
        if n + max_tok > cfgE.n_ctx:
            max_tok = max(0, cfgE.n_ctx - n)
        bucket_p = _round_up(n, cfgE.prompt_bucket)
        toks = np.zeros((1, bucket_p), np.int32)
        toks[0, :n] = ids

        t0 = time.perf_counter()
        need = bucket_p + max_tok + 64
        s_cache = min(_bucket_len(need, 256), cfgE.n_ctx)
        if self._cache is None or self._cache["k"].shape[3] != s_cache:
            self._cache = init_kv_cache(
                cfg, 1, s_cache,
                dtype=jnp.bfloat16 if cfgE.llm_dtype == "bfloat16"
                else jnp.float32, quantized=cfgE.quantized_kv)
        cache = dict(self._cache, fill=jnp.zeros((1,), jnp.int32))
        last, cache = llm_prefill(self.llm_params, jnp.asarray(toks),
                                  jnp.asarray([n], jnp.int32), cache, cfg)
        _sync(last)
        profile.prefill_sec += time.perf_counter() - t0

        key = jax.random.PRNGKey(seed)
        temp_arr = jnp.float32(temp)
        stop_ids = self._stop_ids_dev
        emb = voice.device_embedding()
        table = self.code_table
        spt = cfgc.samples_per_token
        chunk = cfgE.stream_check_interval

        codes: list[int] = []          # host mirror of the device buffer
        committed = 0                  # global commit watermark (host)
        n_gen = 0
        stopped = False
        # Sliding-window mode: the device buffer holds only the trailing
        # `cur_bucket` codes (the step slides it ON DEVICE past committed
        # codes); ONE fixed executable serves the whole stream and each emit
        # decodes O(window) codes.  Full mode keeps the reference's O(T^2)
        # prefix re-decode; its bucket schedule is driven by the DISPATCH
        # count (codes generated <= tokens = k*chunk), so rebucket points
        # are known before results arrive and the pipeline only drains there.
        win_mode = cfgE.stream_window_codes > 0
        if win_mode:
            keep = max(cfgE.stream_window_codes,
                       cfgE.holdback_codes + cfgE.min_commit_step_codes
                       + chunk)
            cur_bucket = _bucket_len(keep + chunk, cfgE.code_bucket)
        else:
            cur_bucket = _bucket_len(min(chunk, max_tok), cfgE.code_bucket)
        codes_buf = jnp.zeros((cur_bucket,), jnp.int32)
        # Device-side loop state: stop latch, token budget and commit
        # watermark live on device so chunk k+1 can be dispatched BEFORE
        # chunk k's results are read — a depth-2 dispatch pipeline that
        # hides the per-chunk host<->device round-trip (the dominant
        # single-stream cost on this relay-tunneled chip).
        n_codes_dev = jnp.int32(0)
        committed_dev = jnp.int32(0)
        stopped_dev = jnp.bool_(False)
        n_tokens_dev = jnp.int32(0)
        max_toks_dev = jnp.int32(max_tok)
        depth = max(1, cfgE.stream_pipeline_depth)
        pending: list = []             # in-flight step outputs, oldest first
        flushed = False                # device-side final flush delivered
        k_codes = cfgE.holdback_codes + cfgE.min_commit_step_codes + chunk

        def process(outs) -> bool:
            """Consume one completed step: update the host mirror + emit."""
            nonlocal n_gen, stopped, committed, flushed
            t1 = time.perf_counter()
            (buf_h, cnt_h, done_h, emit_h, begin_h, target_h, n_codes_h,
             flush_h) = jax.device_get(
                (outs[0], outs[1], outs[2], outs[10], outs[11], outs[12],
                 outs[7], outs[13]))
            profile.llm_sec += time.perf_counter() - t1
            for j in range(int(cnt_h)):
                tid = int(buf_h[j])
                n_gen += 1
                c = table[tid] if 0 <= tid < len(table) else -1
                if c >= 0:
                    codes.append(int(c))
            profile.llm_tokens = n_gen
            stopped = bool(done_h)
            if bool(emit_h) or bool(flush_h):
                profile.decode_calls += 1
                profile.decoded_codes += int(n_codes_h)
                profile.decode_bucket_codes.append(int(outs[6].shape[0]))
                end_c = int(n_codes_h) if bool(flush_h) else int(target_h)
                t1 = time.perf_counter()
                if end_c - int(begin_h) <= k_codes:
                    # normal case: materialize only the emit-window slice
                    # (coordinates relative to `begin`)
                    audio_np = np.asarray(outs[15])
                    base = int(begin_h)
                else:  # pragma: no cover - policy bounds make this unreachable
                    audio_np = np.asarray(outs[14])
                    base = 0
                # audio materialization rides the codec timer (the decode
                # itself runs inside the fused step; see fused_streaming doc)
                profile.codec_sec += time.perf_counter() - t1
            if bool(emit_h):
                committed += int(target_h) - int(begin_h)
                if not emit_range(audio_np, (int(begin_h) - base) * spt,
                                  (int(target_h) - base) * spt, False):
                    return False
            if bool(flush_h):
                # device-side final flush: [committed, n_codes) with no
                # holdback, ending the stream (maybe_emit(true))
                start = int(target_h) if bool(emit_h) else int(begin_h)
                committed += int(n_codes_h) - start
                flushed = True
                if not emit_range(audio_np, (start - base) * spt,
                                  (int(n_codes_h) - base) * spt, True):
                    return False
            return True

        k = 0                          # chunks dispatched
        ok = True

        def drain() -> None:
            # consume all in-flight steps; after a callback abort the
            # remaining outputs are discarded unprocessed (no further emits)
            nonlocal ok
            while pending:
                outs = pending.pop(0)
                if ok:
                    ok = process(outs)

        while ok and k * chunk < max_tok and not stopped:
            if not win_mode:
                want = _bucket_len(min((k + 1) * chunk, max_tok),
                                   cfgE.code_bucket)
                if want != cur_bucket:
                    # grow the device buffer in place — a device-only op,
                    # so the pipeline keeps flowing through rebucket points
                    codes_buf = _grow_buf(codes_buf, want)
                    cur_bucket = want
            t1 = time.perf_counter()
            outs = _fused_stream_step(
                self.llm_params, self.codec_params, last, cache, key,
                temp_arr, stop_ids, self._speech_table_dev, codes_buf,
                n_codes_dev, committed_dev, stopped_dev, n_tokens_dev,
                max_toks_dev, emb, cfg, cfgc,
                chunk, cur_bucket, cfgE.holdback_codes,
                cfgE.min_commit_step_codes, win_mode, not win_mode,
                self._first_commit)
            profile.llm_sec += time.perf_counter() - t1
            (_, _, stopped_dev, last, cache, key, codes_buf, n_codes_dev,
             committed_dev, n_tokens_dev) = outs[:10]
            pending.append(outs)
            k += 1
            if len(pending) >= depth:
                ok = process(pending.pop(0))
        drain()
        if not ok:
            self._cache = cache
            return False

        self._cache = cache

        # final flush — normally already delivered ON DEVICE by the last
        # chunk (full mode, `flush` output); the host path remains for
        # sliding-window mode (whose flush is a full-prefix decode wider
        # than the device window) and as the degenerate-stream fallback
        # (mirrors maybe_emit(is_final=True))
        if not codes:
            return False
        if flushed:
            return True
        if len(codes) <= committed:
            return timed_callback(None, True)
        audio = self.decode_codes(codes, voice,
                                  apply_peak_normalization=False,
                                  profile=profile)
        begin = committed * spt
        return emit_range(audio, begin, len(audio), True)

    # ------------------------------------------------------------------
    # Offline synthesis
    # ------------------------------------------------------------------

    def synthesize(self, voice: VoiceModel, text: str,
                   options: Options = Options()) -> np.ndarray:
        """Offline text -> PCM (`synthesize_to_vector`,
        `test-to-speech.cpp:305-320`)."""
        if options.skip_llm:
            codes = parse_speech_tokens(text)
        else:
            codes = self.tokens_to_codes(self.generate_tokens(text, options))
        if not codes:
            raise RuntimeError("no speech codes generated")
        return self.decode_codes(codes, voice, options.apply_peak_normalization)

    def synthesize_to_file(self, voice: VoiceModel, text: str, path: str,
                           options: Options = Options()) -> None:
        from ..audio.wav import wav_write
        audio = self.synthesize(voice, text, options)
        wav_write(path, audio, self.sample_rate)

    # ------------------------------------------------------------------
    # Streaming synthesis
    # ------------------------------------------------------------------

    def synthesize_stream(self, voice: VoiceModel, text: str,
                          callback: StreamCallback,
                          chunk_samples: int = 0,
                          options: Options = Options(),
                          profile: StreamProfile | None = None) -> bool:
        """Streaming synthesis with the reference commit policy
        (`synthesize_stream_profiled`, `test-to-speech.cpp:348-626`):
        emit check every 20 tokens, 32-code holdback, >=24-code min commit,
        full-prefix re-decode, actual-ratio sample mapping, ~30 ms crossfade,
        chunked callback emission, peak-norm disabled."""
        if profile is None:
            profile = StreamProfile()
        t_total0 = time.perf_counter()
        if callback is None:
            return False
        if chunk_samples <= 0:
            chunk_samples = self.config.chunk_samples
        sr = self.sample_rate
        crossfade = min(sr * 3 // 100, 4096)
        tail: np.ndarray = np.zeros(0, np.float32)

        def timed_callback(samples, is_last):
            t0 = time.perf_counter()
            ok = callback(samples, sr, is_last)
            profile.callback_sec += time.perf_counter() - t0
            if samples is not None and profile.first_audio_sec < 0:
                profile.first_audio_sec = time.perf_counter() - t_total0
            return ok

        def emit_range(audio: np.ndarray, begin: int, end: int,
                       is_final: bool) -> bool:
            # NOTE: ramp/tail math mirrors batching._emit_samples — any
            # policy change must be applied to BOTH.
            nonlocal tail
            if begin >= end:
                if is_final:
                    return timed_callback(None, True)
                return True
            i = begin
            first = True
            while i < end:
                n = min(chunk_samples, end - i)
                chunk = audio[i:i + n].copy()
                if first and tail.size:
                    xf = min(tail.size, chunk.size)
                    j = np.arange(xf, dtype=np.float32)
                    a = (j + 1.0) / (xf + 1.0)
                    chunk[:xf] = (1.0 - a) * tail[:xf] + a * chunk[:xf]
                if n >= crossfade:
                    tail = chunk[-crossfade:].copy()
                else:
                    tail = chunk.copy()
                is_last = is_final and (i + n >= end)
                if not timed_callback(chunk, is_last):
                    return False
                profile.emitted_samples += n
                i += n
                first = False
            return True

        if options.skip_llm:
            codes0 = parse_speech_tokens(text)
            if not codes0:
                # reference: decode fails on empty parse, no final callback
                # (test-to-speech.cpp:419-423 via decode_tokens_to_audio)
                profile.total_sec = time.perf_counter() - t_total0
                return False
            audio = self.decode_codes(codes0, voice,
                                      apply_peak_normalization=False,
                                      profile=profile)
            ok = emit_range(audio, 0, len(audio), True)
            profile.total_sec = time.perf_counter() - t_total0
            return ok

        if (self.config.fused_streaming and self.llm_params is not None
                and not self.config.pipeline_codec
                and self.draft_params is None):
            ok = self._stream_fused(voice, text, emit_range, timed_callback,
                                    options, profile)
            profile.total_sec = time.perf_counter() - t_total0
            return ok

        committed = 0
        codes: list[int] = []
        # pipelined mode: each non-final emit's audio is a device array whose
        # materialization is deferred to the NEXT emit check — the codec
        # decode (on codec_device) overlaps the LLM chunk in between
        pipeline = bool(self.config.pipeline_codec)
        spt = self.samples_per_token
        pending: list = []            # [(audio_dev, T, begin, end)] 0 or 1

        def flush_pending() -> bool:
            if not pending:
                return True
            audio_dev, Tdec, begin, end = pending.pop()
            t0 = time.perf_counter()
            audio = np.asarray(audio_dev)[: Tdec * spt]
            profile.codec_sec += time.perf_counter() - t0
            return emit_range(audio, begin, end, False)

        def maybe_emit(is_final: bool) -> bool:
            nonlocal committed
            if not codes:
                return not is_final
            target = len(codes) if is_final else max(
                len(codes) - self.config.holdback_codes, 0)
            if target <= committed:
                if is_final:
                    if not flush_pending():
                        return False
                    return timed_callback(None, True)
                return True
            min_eff = (self._first_commit if committed == 0
                       else self.config.min_commit_step_codes)
            if not is_final and (target - committed) < min_eff:
                return True
            # quality-first default: re-decode the FULL accumulated prefix;
            # with stream_window_codes > 0, re-decode only the trailing
            # window (O(T) streaming — see EngineConfig)
            window = self.config.stream_window_codes
            start = 0
            if window > 0 and not is_final:
                start = max(0, min(committed, len(codes) - window))
            if pipeline and not is_final:
                # dispatch first, then emit the PREVIOUS decode's audio —
                # the new decode runs while the host splices/emits and while
                # the next LLM chunk runs
                audio_dev, Tdec = self.decode_codes_async(codes[start:], voice)
                profile.decode_calls += 1
                profile.decoded_codes += Tdec
                ok = flush_pending()
                pending.append((audio_dev, Tdec, (committed - start) * spt,
                                (target - start) * spt))
                committed = target
                return ok
            if not flush_pending():
                return False
            audio = self.decode_codes(codes[start:], voice,
                                      apply_peak_normalization=False,
                                      profile=profile)
            spc = len(audio) / (len(codes) - start) if codes else 0.0
            begin = int(round((committed - start) * spc))
            end = int(round((target - start) * spc))
            safe_end = min(end, len(audio))
            if begin >= safe_end:
                if is_final:
                    return timed_callback(None, True)
                return True
            committed = target
            return emit_range(audio, begin, safe_end, is_final)

        ok_holder = {"ok": True}
        table = self.code_table

        def on_token(tid: int, n_gen: int) -> bool:
            if 0 <= tid < len(table) and table[tid] >= 0:
                codes.append(int(table[tid]))
            if n_gen % self.config.stream_check_interval == 0:
                if not maybe_emit(False):
                    ok_holder["ok"] = False
                    return False
            return True

        try:
            self.generate_tokens(text, options, on_token=on_token,
                                 profile=profile)
        except Exception:
            # Mid-stream LLM failure: flush whatever was committed, then
            # report failure (the reference breaks the loop and flushes,
            # test-to-speech.cpp:596-617).
            ok_holder["ok"] = False
            try:
                maybe_emit(True)
            except Exception:
                pass
        ok = ok_holder["ok"]
        if ok:
            ok = maybe_emit(True)
        profile.total_sec = time.perf_counter() - t_total0
        return ok

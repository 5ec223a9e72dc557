"""Continuous batching: many concurrent utterances through one decode loop.

The reference is strictly one-utterance-at-a-time (one llama_context per
synthesis call, `test-to-speech.cpp:108,443`; SURVEY.md §2.3).  This module
supplies the scale-out serving layer from the north star: a slot-based
scheduler multiplexing concurrent TTS requests over a shared batched KV
cache — admit into freed slots (per-slot prefill), step all active slots
together in on-device chunks, stream each request's audio out through the
same commit-holdback policy as the single-stream engine.

Works on one chip as-is; with a mesh, shard the cache batch dim over 'data'
and weights over 'model' (parallel/sharding.py) and the same code scales
out — the scheduler is sharding-agnostic.
"""

from __future__ import annotations

import sys
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llm import (
    init_kv_cache, llm_generate_chunk_batched, llm_prefill_slots,
)
from ..text import build_prompt, normalize_tts_text
from .engine import Options, TTSEngine, VoiceModel, _bucket_len, _round_up
from .profile import StreamProfile


@dataclass
class Request:
    req_id: int
    text: str
    voice: VoiceModel
    callback: Callable[[Optional[np.ndarray], int, bool], bool]
    options: Options = field(default_factory=Options)
    on_finish: Optional[Callable] = None
    # state
    slot: int = -1
    codes: list = field(default_factory=list)
    committed: int = 0
    tail: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    n_tokens: int = 0
    done: bool = False
    failed: bool = False
    submitted_at: float = 0.0
    first_audio_at: float = -1.0
    finished_at: float = 0.0
    emitted_samples: int = 0


class ContinuousBatcher:
    """Slot scheduler over a shared TTSEngine.

    Usage:
        batcher = ContinuousBatcher(engine, n_slots=8)
        batcher.submit(text, voice, callback)
        while batcher.pending:
            batcher.step()
    """

    def __init__(self, engine: TTSEngine, n_slots: int = 8,
                 chunk_steps: int = 20, quantized_kv: bool = False,
                 ctx_len: int | None = None, mesh=None,
                 fused: bool = False, pipeline_depth: int = 2,
                 admit_wave: int = 0):
        """`mesh`: optional jax Mesh for sharded serving — the KV cache
        batch dim goes over 'data' and heads over 'model'
        (parallel/sharding.py); pair with engine.llm_params already sharded
        via shard_llm_params.  The scheduler itself is sharding-agnostic.

        `pipeline_depth`: chunk dispatch pipelining — chunk k+1 is
        dispatched from device-resident state BEFORE chunk k's results are
        read, hiding the per-chunk dispatch + host-glue latency (~30 ms on
        a relay-tunneled chip).  Host-side bookkeeping (budget stops,
        admissions) lags one chunk; per-slot request snapshots drop a
        stale in-flight chunk's tokens when a slot is finished/re-admitted
        before its results arrive.  Depth 1 = the unpipelined loop.

        `admit_wave`: cap on admissions per scheduler step (0 = admit into
        every free slot at once, the default).  A cap staggers a cold-start
        burst into sub-waves so the first sub-wave's prefill + first codec
        decode are small and its first commits flow before the whole burst
        is admitted (VERDICT r3 item 5).  Trade-off: the batched chunk's
        cost is occupancy-independent (it steps the full slot batch), so
        later sub-waves start 1 chunk apiece behind — which raises THEIR
        time-to-first-audio; measure before enabling (benchmarks, r4)."""
        assert engine.llm_params is not None, "batching needs the LLM"
        self.engine = engine
        self.cfg = engine.llm_cfg
        self.n_slots = n_slots
        self.chunk_steps = chunk_steps
        self.admit_wave = admit_wave
        self.mesh = mesh
        self.use_fused = fused
        if ctx_len is None:
            # geometric bucket of prompt-bucket + token budget: per-step
            # attention traffic scales with this length, not n_ctx
            need = (engine.config.prompt_bucket * 2
                    + engine.config.max_tokens + chunk_steps + 64)
            ctx_len = min(_bucket_len(need, 256), engine.config.n_ctx)
        self.ctx_len = ctx_len
        self.quantized_kv = quantized_kv
        dtype = (jnp.bfloat16 if engine.config.llm_dtype == "bfloat16"
                 else jnp.float32)
        self._cache_dtype = dtype
        self.cache = init_kv_cache(self.cfg, n_slots, ctx_len,
                                   dtype=dtype, quantized=quantized_kv)
        self.last_logits = jnp.zeros((n_slots, self.cfg.n_vocab), jnp.float32)
        if mesh is not None:
            from ..parallel.sharding import shard_kv_cache
            from jax.sharding import NamedSharding, PartitionSpec as Psp
            self.cache = shard_kv_cache(self.cache, mesh)
            self.last_logits = jax.device_put(
                self.last_logits, NamedSharding(mesh, Psp("data", None)))
        self.active = np.zeros(n_slots, bool)
        # host-side per-slot fill upper bound (prompt + dispatched chunk
        # budget): picks the attention-length bucket for each chunk, so
        # per-step KV reads scale with the live context, not ctx_len
        self._fill_ub = np.zeros(n_slots, np.int64)
        self.slot_req: list[Optional[Request]] = [None] * n_slots
        self.waiting: deque[Request] = deque()
        self._next_id = 0
        self._stop_ids = jnp.asarray(
            [engine._eos_id, engine._im_end_id], jnp.int32)
        self._table = engine.code_table
        # per-slot sampling state: each request samples with its own
        # temperature and its own PRNG key seeded from options.seed
        # (engine defaults when unset, like the single-stream _resolve);
        # slot keys advance once per generated token inside the chunk, so
        # a request's samples are reproducible regardless of batching and
        # token-match a single-stream run at the same seed
        self._slot_temp = jnp.full((n_slots,), engine.config.temperature,
                                   jnp.float32)
        self._slot_key = jax.random.split(
            jax.random.PRNGKey(engine.config.seed), n_slots)
        # fused-step device state (rebuilt lazily from host mirrors)
        self._codes_buf = None
        self._codes_bucket = 0
        self._dirty_codes = True
        self._embs = None
        # pipelined-codec deferred emissions: [(audio_dev, items)] where
        # items = [(req, row, sample_offset, n_samples)]
        self._pending: list = []
        # chunk dispatch pipeline: device-resident active mask + in-flight
        # chunk outputs [(buf, active_out, per-slot request snapshot)]
        self._depth = max(1, pipeline_depth)
        self._active_dev = jnp.asarray(self.active)
        self._inflight: deque = deque()
        # coarse wall-clock stage accounting (stream_bench.stage.* analogue
        # for the batched path; filled by the scheduler, read by benches)
        self.stage = {"admit_sec": 0.0, "llm_wait_sec": 0.0,
                      "codec_sync_sec": 0.0, "codec_dispatch_sec": 0.0,
                      "flush_wait_sec": 0.0, "chunks": 0, "decodes": 0,
                      "prefills": 0}

    # ------------------------------------------------------------------
    def warmup(self, prompt_len: int = 64) -> None:
        """Precompile the batched serving executables BEFORE traffic: the
        A=n_slots batched slot prefill at the prompt bucket, the chunk
        executable at the first attention bucket, and the batched sliced
        codec decode at the first-commit shape.  The single-stream twin is
        TTSEngine.warmup; without this, the first admission wave absorbs
        the compiles (the serving benches hide it in a warm pass, a real
        server should not).  Serving state is re-initialized afterwards."""
        eng = self.engine
        cfgE = eng.config
        bucket = _round_up(max(1, prompt_len), cfgE.prompt_bucket)
        # the prefill executable specializes on the wave size A: warm the
        # two shapes real traffic hits — the full wave (cold start / burst
        # refill) and A=1 (a single late-joining request, the most common
        # partial wave at steady state; ADVICE r3)
        _, self.cache = llm_prefill_slots(
            eng.llm_params, jnp.zeros((1, bucket), jnp.int32),
            jnp.ones((1,), jnp.int32), self.cache,
            jnp.zeros((1,), jnp.int32), self.cfg)
        A = self.n_slots
        slots = jnp.arange(A, dtype=jnp.int32)
        last, self.cache = llm_prefill_slots(
            eng.llm_params, jnp.zeros((A, bucket), jnp.int32),
            jnp.ones((A,), jnp.int32), self.cache, slots, self.cfg)
        self.last_logits = self.last_logits.at[slots].set(last)
        need = bucket + self.chunk_steps
        attn_len = min(_bucket_len(need, 128), self.ctx_len)
        if attn_len >= self.ctx_len:
            attn_len = 0
        active = jnp.zeros((A,), bool).at[0].set(True)
        buf, _, self.last_logits, self.cache, self._slot_key = \
            llm_generate_chunk_batched(
                eng.llm_params, self.last_logits, self.cache, active,
                self._slot_key, self._slot_temp, self._stop_ids, self.cfg,
                self.chunk_steps, attn_len)
        jax.device_get(buf)

        if eng.codec_params is not None:
            spt = eng.codec_cfg.samples_per_token
            n0 = (cfgE.holdback_codes + eng._first_commit
                  + cfgE.stream_check_interval)
            emb = np.zeros((eng.codec_cfg.adaln_dim,), np.float32)
            voices = [VoiceModel(embedding=emb)] * A
            audio, _, _ = eng.decode_codes_batch_sliced_async(
                [[1] * n0] * A, voices, [0] * A,
                [eng._first_commit * spt] * A)
            np.asarray(audio)

        # reset serving state (prefill/chunk above donated the cache)
        self.cache = init_kv_cache(self.cfg, self.n_slots, self.ctx_len,
                                   dtype=self._cache_dtype,
                                   quantized=self.quantized_kv)
        self.last_logits = jnp.zeros_like(self.last_logits)
        self._slot_key = jax.random.split(
            jax.random.PRNGKey(self.engine.config.seed), self.n_slots)
        self._active_dev = jnp.asarray(self.active)
        if self.mesh is not None:
            from ..parallel.sharding import shard_kv_cache
            from jax.sharding import NamedSharding, PartitionSpec as Psp
            self.cache = shard_kv_cache(self.cache, self.mesh)
            self.last_logits = jax.device_put(
                self.last_logits, NamedSharding(self.mesh, Psp("data", None)))

    @property
    def pending(self) -> int:
        return (len(self.waiting) + int(np.sum(self.active))
                + len(getattr(self, "_inflight", ())))

    def submit(self, text: str, voice: VoiceModel,
               callback, options: Options = Options(),
               on_finish=None) -> int:
        req = Request(req_id=self._next_id, text=text, voice=voice,
                      callback=callback, options=options, on_finish=on_finish,
                      submitted_at=time.perf_counter())
        self._next_id += 1
        self.waiting.append(req)
        return req.req_id

    # ------------------------------------------------------------------
    def _admit(self) -> None:
        """Fill free slots with waiting requests.

        All admissions of one scheduler step prefill in ONE batched dispatch
        (`llm_prefill_slots`) — a burst refill after a wave of completions
        otherwise pays one ~30 ms program dispatch per slot on a
        relay-tunneled chip.  Prompts are right-padded to the longest
        admitted prompt's bucket; per-slot `fill` masks the padding."""
        eng = self.engine
        admit: list[tuple[int, Request, list[int]]] = []
        for slot in range(self.n_slots):
            if self.admit_wave > 0 and len(admit) >= self.admit_wave:
                break
            if self.active[slot] or not self.waiting:
                continue
            req = self.waiting.popleft()
            prompt = build_prompt(normalize_tts_text(req.text))
            ids = eng.tokenizer.encode(prompt)
            n = len(ids)
            max_tok = (req.options.max_tokens if req.options.max_tokens > 0
                       else eng.config.max_tokens)
            if n + max_tok + self.chunk_steps > self.ctx_len:
                clamped = max(0, self.ctx_len - n - self.chunk_steps)
                if clamped < max_tok:
                    sys.stderr.write(
                        f"miotts: request {req.req_id}: token budget "
                        f"{max_tok} -> {clamped} (prompt {n} tokens, "
                        f"ctx_len {self.ctx_len}; pass ctx_len= to the "
                        f"batcher for longer utterances)\n")
                max_tok = clamped
            # an over-long prompt can neither prefill (its bucket exceeds
            # the cache length) nor generate: fail THIS request, never the
            # shared scheduler (reference semantics: llama_decode fails ->
            # that synthesis returns false, test-to-speech.cpp:143)
            if (max_tok < 1 or _round_up(n, eng.config.prompt_bucket)
                    > self.ctx_len):
                sys.stderr.write(
                    f"miotts: request {req.req_id}: prompt ({n} tokens) "
                    f"does not fit ctx_len {self.ctx_len}; rejected\n")
                req.done = True
                req.failed = True
                req.finished_at = time.perf_counter()
                try:
                    req.callback(None, eng.sample_rate, True)
                except Exception:
                    pass
                if req.on_finish is not None:
                    try:
                        req.on_finish(req)
                    except Exception:
                        pass
                continue
            req._max_tokens = max_tok
            admit.append((slot, req, ids))
        if not admit:
            return
        t0 = time.perf_counter()
        bucket = _round_up(max(len(ids) for _, _, ids in admit),
                           eng.config.prompt_bucket)
        A = len(admit)
        toks = np.zeros((A, bucket), np.int32)
        n_real = np.zeros((A,), np.int32)
        slots = np.zeros((A,), np.int32)
        for i, (slot, req, ids) in enumerate(admit):
            toks[i, :len(ids)] = ids
            n_real[i] = len(ids)
            slots[i] = slot
        last, self.cache = llm_prefill_slots(
            eng.llm_params, jnp.asarray(toks), jnp.asarray(n_real),
            self.cache, jnp.asarray(slots), self.cfg)
        self.last_logits = self.last_logits.at[jnp.asarray(slots)].set(last)
        self._active_dev = self._active_dev.at[jnp.asarray(slots)].set(True)
        temps = np.array([r.options.temperature if r.options.temperature >= 0
                          else eng.config.temperature
                          for _, r, _ in admit], np.float32)
        keys = jnp.stack([jax.random.PRNGKey(
            r.options.seed if r.options.seed >= 0 else eng.config.seed)
            for _, r, _ in admit])
        self._slot_temp = self._slot_temp.at[jnp.asarray(slots)].set(
            jnp.asarray(temps))
        self._slot_key = self._slot_key.at[jnp.asarray(slots)].set(keys)
        for slot, req, ids in admit:
            self.active[slot] = True
            self.slot_req[slot] = req
            req.slot = slot
            self._fill_ub[slot] = len(ids)
        self._dirty_codes = True
        self.stage["admit_sec"] += time.perf_counter() - t0
        self.stage["prefills"] += 1

    def _finish(self, req: Request, ok: bool) -> None:
        req.done = True
        req.failed = not ok
        req.finished_at = time.perf_counter()
        slot = req.slot
        self.active[slot] = False
        self.slot_req[slot] = None
        # clear the device-resident bit too (budget stops are host-detected;
        # an already-dispatched in-flight chunk may still step this slot
        # once — its tokens are dropped by the request snapshot check)
        self._active_dev = self._active_dev.at[slot].set(False)
        if req.on_finish is not None:
            try:
                req.on_finish(req)
            except Exception:
                pass

    def _emit_policy(self, req: Request, is_final: bool):
        """Commit-holdback decision (test-to-speech.cpp:507-522).

        Returns ("decode", target) when a re-decode + emission is due,
        ("final_cb", None) when only the final sentinel remains, or
        ("done", ok)."""
        cfgE = self.engine.config
        if not req.codes:
            return ("done", not is_final)
        target = (len(req.codes) if is_final
                  else max(len(req.codes) - cfgE.holdback_codes, 0))
        if target <= req.committed:
            return ("final_cb", None) if is_final else ("done", True)
        # first emission uses the smaller first-commit threshold (TTFA
        # lever); the holdback right-context contract is unchanged
        min_eff = (self.engine._first_commit if req.committed == 0
                   else cfgE.min_commit_step_codes)
        if not is_final and (target - req.committed) < min_eff:
            return ("done", True)
        return ("decode", target)

    def _emit_audio(self, req: Request, audio: np.ndarray, target: int,
                    is_final: bool, start: int = 0) -> bool:
        """Splice + chunked crossfaded emission of decoded audio
        (test-to-speech.cpp:367-417,554-571).  `start` is the first code of
        the decoded window (0 = full-prefix decode)."""
        eng = self.engine
        cfgE = eng.config
        spc = len(audio) / (len(req.codes) - start)
        begin = int(round((req.committed - start) * spc))
        end = min(int(round((target - start) * spc)), len(audio))
        if begin >= end:
            if is_final:
                return req.callback(None, eng.sample_rate, True)
            return True
        req.committed = target
        return self._emit_samples(req, audio, begin, end, is_final)

    def _emit_samples(self, req: Request, audio: np.ndarray, begin: int,
                      end: int, is_final: bool) -> bool:
        """Chunked emission of audio[begin:end] with ~30 ms crossfade against
        the previous tail (test-to-speech.cpp:367-417).

        NOTE: the ramp/tail math mirrors engine.synthesize_stream's
        emit_range — any policy change must be applied to BOTH (they differ
        only in where the tail lives and in profiling hooks)."""
        eng = self.engine
        cfgE = eng.config
        sr = eng.sample_rate
        crossfade = min(sr * 3 // 100, 4096)
        i, first = begin, True
        while i < end:
            n = min(cfgE.chunk_samples, end - i)
            chunk = audio[i:i + n].copy()
            if first and req.tail.size:
                xf = min(req.tail.size, chunk.size)
                a = (np.arange(xf, dtype=np.float32) + 1.0) / (xf + 1.0)
                chunk[:xf] = (1.0 - a) * req.tail[:xf] + a * chunk[:xf]
            req.tail = chunk[-crossfade:].copy() if n >= crossfade else chunk.copy()
            last_chunk = is_final and (i + n >= end)
            if req.first_audio_at < 0:
                req.first_audio_at = time.perf_counter()
            if not req.callback(chunk, sr, last_chunk):
                return False
            req.emitted_samples += n
            i += n
            first = False
        return True

    # ------------------------------------------------------------------
    def step(self) -> None:
        """One scheduler iteration: admit -> batched decode chunk ->
        distribute tokens -> emit/finish.

        The default path batches codec decodes across only the committing
        slots (one vmapped dispatch); `fused=True` instead folds generation
        + policy + an all-slot codec decode into one executable — measured
        SLOWER at 16 slots (the all-slot decode outweighs the saved program
        switch, 19.8x vs 23.6x aggregate on 2.6B), so it is opt-in and
        mainly useful at low slot counts."""
        if getattr(self, "use_fused", False):
            return self._step_fused()
        return self._step_unfused()

    def _flush_pending(self) -> None:
        """Materialize + emit deferred (pipelined) codec decodes.  Called
        after the next LLM chunk has been dispatched, so the wait here
        overlaps LLM compute on the other device."""
        t0 = time.perf_counter()
        for audio_dev, items in self._pending:
            audio_np = np.asarray(audio_dev)
            if audio_np.dtype == np.int16:
                audio_np = audio_np.astype(np.float32) / 32767.0
            for req, row, off, n in items:
                if req.done or n <= 0:
                    continue
                seg = audio_np[row, off:off + n]
                if not self._emit_samples(req, seg, 0, n, False):
                    self._finish(req, False)
        if self._pending:
            self.stage["flush_wait_sec"] += time.perf_counter() - t0
        self._pending = []

    def _step_unfused(self) -> None:
        self._admit()
        dispatched = False
        if np.any(self.active):
            # attention-length bucket: every active slot's fill stays under
            # fill_ub, so reading only the first attn_len cache positions
            # is exact.  Geometric buckets keep the jit-key count O(log n).
            need = int(self._fill_ub[self.active].max()) + self.chunk_steps
            attn_len = min(_bucket_len(need, 128), self.ctx_len)
            if attn_len >= self.ctx_len:
                attn_len = 0                      # full cache — no slice
            (buf, self._active_dev, self.last_logits, self.cache,
             self._slot_key) = llm_generate_chunk_batched(
                    self.engine.llm_params, self.last_logits, self.cache,
                    self._active_dev, self._slot_key, self._slot_temp,
                    self._stop_ids, self.cfg, self.chunk_steps, attn_len)
            self._fill_ub[self.active] += self.chunk_steps
            self._inflight.append((buf, self._active_dev,
                                   list(self.slot_req)))
            dispatched = True
        # the chunk above is dispatched asynchronously: emit last step's
        # deferred codec audio (if any) while it runs
        self._flush_pending()
        # process queued chunk results; with dispatch pipelining the
        # newest chunk stays in flight while its predecessor is consumed
        keep = self._depth - 1 if dispatched else 0
        while len(self._inflight) > keep:
            self._process_chunk(*self._inflight.popleft())

    def _process_chunk(self, buf, active_dev, snapshot) -> None:
        """Consume one chunk's results: distribute tokens, run the commit
        policy, emit / finish.  `snapshot` is the per-slot request list at
        dispatch time — a slot finished or re-admitted since then drops its
        stale tokens here."""
        t0 = time.perf_counter()
        buf, still_active = jax.device_get((buf, active_dev))
        self.stage["llm_wait_sec"] += time.perf_counter() - t0
        self.stage["chunks"] += 1

        table = self._table
        decode_work: list[tuple[Request, int, bool]] = []
        for slot in range(self.n_slots):
            req = snapshot[slot]
            if req is None or req.done or self.slot_req[slot] is not req:
                continue
            toks = buf[slot]
            toks = toks[toks >= 0]
            # truncate to the request's token budget (the device chunk is
            # budget-blind; the single-stream path truncates identically,
            # engine take=min(cnt, max_tok - n_gen))
            budget = getattr(req, "_max_tokens", 10 ** 9) - req.n_tokens
            toks = toks[:max(0, budget)]
            for tid in toks:
                req.n_tokens += 1
                code = table[tid] if 0 <= tid < len(table) else -1
                if code >= 0:
                    req.codes.append(int(code))
            hit_stop = not still_active[slot]
            out_of_budget = req.n_tokens >= getattr(req, "_max_tokens", 10 ** 9)
            is_final = hit_stop or out_of_budget
            action, val = self._emit_policy(req, is_final)
            if action == "decode":
                decode_work.append((req, val, is_final))
                continue
            if action == "final_cb":
                ok = req.callback(None, self.engine.sample_rate, True)
            else:
                ok = val
            if is_final:
                self._finish(req, ok)
            elif not ok:
                self._finish(req, False)

        if decode_work:
            # ONE vmapped codec dispatch for every stream that commits this
            # step — N concurrent emissions cost one device round-trip.
            # With stream_window_codes > 0 each stream decodes only its
            # trailing window (O(T) streaming, see EngineConfig), which also
            # pins the shared codec bucket to the window size instead of the
            # longest stream's full prefix.
            window = self.engine.config.stream_window_codes
            starts = []
            for r, _, is_final in decode_work:
                s = 0
                if window > 0 and not is_final:
                    s = max(0, min(r.committed, len(r.codes) - window))
                starts.append(s)
            sync_work = list(zip(decode_work, starts))
            if self.engine.config.serving_pipeline_codec:
                # non-final commits: dispatch ONE batched decode and defer
                # its materialization to the next step (it runs on the codec
                # device while the next LLM chunk runs); finals stay
                # synchronous — their audio is needed to finish the request.
                # A stream's FIRST commit also stays synchronous: deferring
                # it would add one whole check interval to time-to-first-
                # audio for zero pipeline benefit at admission waves.
                deferred = [(r, t, s) for (r, t, f), s in sync_work
                            if not f and r.committed > 0]
                sync_work = [((r, t, f), s) for (r, t, f), s in sync_work
                             if f or r.committed == 0]
                if deferred:
                    spt = self.engine.codec_cfg.samples_per_token
                    t0 = time.perf_counter()
                    # dispatch ONLY each stream's [committed, target) slice
                    # (on-device slicing: the full windows would move ~6x
                    # the bytes over the relay's ~66 MB/s host link)
                    audio_dev, offs, n_samp = \
                        self.engine.decode_codes_batch_sliced_async(
                            [r.codes[s:] for r, _, s in deferred],
                            [r.voice for r, _, _ in deferred],
                            [(r.committed - s) * spt for r, _, s in deferred],
                            [(t - s) * spt for r, t, s in deferred])
                    self.stage["codec_dispatch_sec"] += time.perf_counter() - t0
                    self.stage["decodes"] += 1
                    items = []
                    for row, (req, target, s) in enumerate(deferred):
                        req.committed = target
                        items.append((req, row, offs[row], n_samp[row]))
                    self._pending.append((audio_dev, items))
            if sync_work:
                spt = self.engine.codec_cfg.samples_per_token
                t0 = time.perf_counter()
                segs = self.engine.decode_codes_batch_sliced(
                    [r.codes[s:] for (r, _, _), s in sync_work],
                    [r.voice for (r, _, _), _ in sync_work],
                    [(r.committed - s) * spt for (r, _, _), s in sync_work],
                    [(t - s) * spt for (r, t, _), s in sync_work])
                self.stage["codec_sync_sec"] += time.perf_counter() - t0
                self.stage["decodes"] += 1
                for ((req, target, is_final), s), seg in zip(sync_work, segs):
                    if seg.size == 0:
                        ok = (req.callback(None, self.engine.sample_rate, True)
                              if is_final else True)
                    else:
                        req.committed = target
                        ok = self._emit_samples(req, seg, 0, seg.size,
                                                is_final)
                    if is_final:
                        self._finish(req, ok)
                    elif not ok:
                        self._finish(req, False)

    def _step_fused(self) -> None:
        """Fused scheduler iteration (see engine._fused_batch_step): one
        resident executable runs the batched chunk, per-slot commit policy,
        and the vmapped codec decode; the host only splices and emits."""
        from .engine import _fused_batch_step

        eng = self.engine
        cfgE = eng.config
        self._admit()
        if not np.any(self.active):
            return

        B = self.n_slots
        spt = eng.codec_cfg.samples_per_token
        # device-resident per-slot code buffers, rebuilt on bucket growth or
        # admission churn from the host mirrors
        max_len = max((len(r.codes) for r in self.slot_req if r), default=0)
        want_bucket = _bucket_len(max_len + self.chunk_steps, cfgE.code_bucket)
        if getattr(self, "_codes_buf", None) is None or \
                self._codes_bucket != want_bucket or self._dirty_codes:
            nb = np.zeros((B, want_bucket), np.int32)
            embs = np.zeros((B, eng.codec_cfg.adaln_dim), np.float32)
            for slot, req in enumerate(self.slot_req):
                if req is not None:
                    nb[slot, :len(req.codes)] = req.codes
                    embs[slot] = req.voice.embedding
            self._codes_buf = jnp.asarray(nb)
            self._embs = jnp.asarray(embs)
            self._codes_bucket = want_bucket
            self._dirty_codes = False

        n_codes = np.array([len(r.codes) if r else 0 for r in self.slot_req],
                           np.int32)
        committed = np.array([r.committed if r else 0 for r in self.slot_req],
                             np.int32)
        n_tok = np.array([r.n_tokens if r else 0 for r in self.slot_req],
                         np.int32)
        max_toks = np.array(
            [getattr(r, "_max_tokens", 0) if r else 0 for r in self.slot_req],
            np.int32)

        (buf, active_dev, self.last_logits, self.cache, self._slot_key,
         self._codes_buf,
         _, _, emit_dev, target_dev, audio) = _fused_batch_step(
            eng.llm_params, eng.codec_params, self.last_logits, self.cache,
            jnp.asarray(self.active), self._slot_key, self._slot_temp,
            self._stop_ids,
            jnp.asarray(self._table), self._codes_buf, jnp.asarray(n_codes),
            jnp.asarray(committed), jnp.asarray(n_tok), jnp.asarray(max_toks),
            self._embs, self.cfg, eng.codec_cfg, self.chunk_steps,
            self._codes_bucket, cfgE.holdback_codes,
            cfgE.min_commit_step_codes, eng._first_commit)
        t0 = time.perf_counter()
        buf_h, active_h, emit_h, target_h = jax.device_get(
            (buf, active_dev, emit_dev, target_dev))
        self.stage["llm_wait_sec"] += time.perf_counter() - t0
        self.stage["chunks"] += 1

        table = self._table
        audio_np = None
        for slot in range(B):
            if not self.active[slot]:
                continue
            req = self.slot_req[slot]
            toks = buf_h[slot]
            toks = toks[toks >= 0]
            for tid in toks:
                req.n_tokens += 1
                c = table[tid] if 0 <= tid < len(table) else -1
                if c >= 0:
                    req.codes.append(int(c))
            if emit_h[slot]:
                if audio_np is None:
                    t0 = time.perf_counter()
                    audio_np = np.asarray(audio)
                    self.stage["codec_sync_sec"] += time.perf_counter() - t0
                    self.stage["decodes"] += 1
                target = int(target_h[slot])
                seg = audio_np[slot]
                ok = self._emit_segment(req, seg, target, spt)
                if not ok:
                    self._finish(req, False)
                    self._dirty_codes = True
                    continue
            if not active_h[slot]:
                # stopped (eos/im_end) or out of budget -> final flush
                action, val = self._emit_policy(req, True)
                if action == "decode":
                    fin_audio = eng.decode_codes(req.codes, req.voice,
                                                 apply_peak_normalization=False)
                    ok = self._emit_audio(req, fin_audio, val, True)
                elif action == "final_cb":
                    ok = req.callback(None, eng.sample_rate, True)
                else:
                    ok = val
                self._finish(req, ok)
                self._dirty_codes = True
        self.active = np.array([r is not None for r in self.slot_req])

    def _emit_segment(self, req: Request, audio: np.ndarray, target: int,
                      spt: int) -> bool:
        """Splice+emit [committed, target) codes from a fused-step decode
        (exact spt mapping; crossfade identical to _emit_audio)."""
        begin = req.committed * spt
        end = target * spt
        if begin >= end:
            return True
        req.committed = target
        return self._emit_samples(req, audio, begin, end, False)

    def run_until_done(self, max_iters: int = 10 ** 6) -> None:
        it = 0
        while self.pending and it < max_iters:
            self.step()
            it += 1

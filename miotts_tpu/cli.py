"""miotts CLI — offline synthesis, streaming benchmark, stream-compare,
tensor dump.

Flag vocabulary follows the reference binaries
(`/root/reference/src/main.cpp:24-43`,
`examples/stream-benchmark.cpp`, `examples/stream-compare.cpp`) minus the
CPU-only knobs (--threads, -ngl — SURVEY.md §2.2: irrelevant on TPU).

Subcommands:
  synth      text -> WAV (default; `miotts` equivalent)
  bench      streaming benchmark, prints stream_bench.* metrics
  compare    offline-vs-streaming fidelity, prints compare.* metrics
  analyze    waveform health report for a WAV
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _add_model_args(p: argparse.ArgumentParser, need_model=True):
    p.add_argument("-m", "--model", default="", help="MioTTS LLM GGUF path")
    p.add_argument("-c", "--codec", required=True, help="MioCodec GGUF path")
    p.add_argument("-v", "--voice", default="", help="voice .emb.gguf path")
    p.add_argument("-p", "--prompt", default="", help="text to synthesize")
    p.add_argument("-t", "--temp", type=float, default=0.8)
    p.add_argument("--max-tokens", type=int, default=700)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--skip-llm", action="store_true",
                   help="treat --prompt as raw <|s_N|> token text")
    p.add_argument("--draft-model", default="",
                   help="smaller same-family GGUF (e.g. MioTTS-0.1B) for "
                        "speculative decoding; exact output distribution, "
                        "token-identical at --temp 0")
    p.add_argument("--spec-tokens", type=int, default=6,
                   help="draft tokens per speculative round (with "
                        "--draft-model)")
    p.add_argument("--holdback-codes", type=int, default=32,
                   help="streaming commit holdback: codes of right context "
                        "held back from every mid-stream emission (the "
                        "reference's fixed 32, test-to-speech.cpp:513-515). "
                        "Raising it trades time-to-first-audio for stream-"
                        "vs-offline fidelity: the codec's receptive field "
                        "is ~6x32 codes, so larger holdbacks give mid-"
                        "stream emissions more settled context")


def _make_engine(args):
    from .runtime.engine import EngineConfig, TTSEngine
    return TTSEngine(EngineConfig(
        model_path=args.model, codec_path=args.codec,
        temperature=args.temp, max_tokens=args.max_tokens, seed=args.seed,
        draft_model_path=getattr(args, "draft_model", ""),
        spec_tokens=getattr(args, "spec_tokens", 6),
        holdback_codes=getattr(args, "holdback_codes", 32)))


def _make_options(args):
    from .runtime.engine import Options
    return Options(temperature=args.temp, max_tokens=args.max_tokens,
                   skip_llm=args.skip_llm, seed=args.seed)


def _load_voice(args):
    from .runtime.engine import VoiceModel
    if not args.voice:
        print("Error: --voice is required", file=sys.stderr)
        sys.exit(1)
    return VoiceModel(args.voice)


def cmd_synth(args) -> int:
    if args.dump_tensors:
        from .gguf import GGUFReader
        with GGUFReader(args.codec) as r:
            print(f"Tensors in {args.codec}: {len(r.tensors)}")
            for name in r.tensor_order:
                info = r.tensors[name]
                ne = list(info.ne) + [1] * (4 - len(info.ne))
                print(f"  {name:<60s} [{ne[0]:5d}, {ne[1]:5d}, {ne[2]:5d}, "
                      f"{ne[3]:5d}] type={info.type_name}")
        return 0
    if not args.prompt:
        print("Error: --prompt is required", file=sys.stderr)
        return 1
    if not args.skip_llm and not args.model:
        print("Error: --model is required (or use --skip-llm)", file=sys.stderr)
        return 1
    try:
        # engine construction can fail too (bad paths, draft/target vocab
        # mismatch) — same reference failure semantics: message to stderr,
        # exit 1, no WAV (test-to-speech.cpp error paths are fprintf +
        # early return)
        engine = _make_engine(args)
        voice = _load_voice(args)
        engine.synthesize_to_file(voice, args.prompt, args.output,
                                  _make_options(args))
    except (RuntimeError, ValueError, OSError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    print(f"Saved: {args.output}", file=sys.stderr)
    return 0


def cmd_stream(args) -> int:
    """Real-time streaming through the bounded queue
    (`examples/stream-to-device.cpp` equivalent): `--device` plays on the
    host audio device via a spawned PCM player; the default sink is an
    s16le PCM stream suitable for `aplay -f S16_LE -r 44100` piping or
    network serving."""
    from .runtime.playback import stream_to_sink
    engine = _make_engine(args)
    voice = _load_voice(args)
    if args.device:
        return 0 if stream_to_sink(
            engine, voice, args.prompt, options=_make_options(args),
            chunk_samples=args.chunk_samples,
            queue_seconds=args.queue_seconds,
            dump_fed_path=args.dump_fed_wav or None, device=True) else 1
    out = sys.stdout.buffer if args.output == "-" else open(args.output, "wb")
    try:
        ok = stream_to_sink(engine, voice, args.prompt, out=out,
                            options=_make_options(args),
                            chunk_samples=args.chunk_samples,
                            queue_seconds=args.queue_seconds,
                            dump_fed_path=args.dump_fed_wav or None)
    finally:
        if out is not sys.stdout.buffer:
            out.close()
    return 0 if ok else 1


def cmd_bench(args) -> int:
    """Streaming benchmark with a no-op callback
    (`examples/stream-benchmark.cpp:86-167` metric contract)."""
    from .runtime.profile import StreamProfile, device_trace
    engine = _make_engine(args)
    voice = _load_voice(args)
    profile = StreamProfile()
    emitted = [0]

    def cb(samples, sr, is_last):
        if samples is not None:
            emitted[0] += len(samples)
        return True

    with device_trace(getattr(args, "trace", "")):
        ok = engine.synthesize_stream(voice, args.prompt, cb,
                                      chunk_samples=args.chunk_samples,
                                      options=_make_options(args),
                                      profile=profile)
    if not ok:
        print("stream_bench.error=1")
        return 1
    # Fused streaming folds codec+iSTFT into one executable; re-attribute
    # stage time from device measurements so the per-stage contract holds.
    engine.attribute_stages(profile)
    if not profile.stages_trusted:
        print("stream_bench.stage.untrusted=1  "
              "(a device stage measurement read 0 even after the escalated "
              "retry; the codec/istft split below is unreliable)",
              file=sys.stderr)
    audio_sec = emitted[0] / engine.sample_rate
    total = max(profile.total_sec, 1e-9)
    for k, v in profile.as_metrics(audio_sec).items():
        if k.startswith("stream_bench.stage."):
            # reference prints stages as seconds + percent-of-total
            # (stream-benchmark.cpp:163-166)
            print(f"{k}={v:.6f} ({100.0 * v / total:.2f}%)")
        else:
            print(f"{k}={v:.6f}" if isinstance(v, float) else f"{k}={v}")
    st = getattr(engine, "_spec_stats", None)
    if st and st.get("drafted"):
        # speculative decoding observability (with --draft-model)
        print(f"stream_bench.spec_rounds={st['rounds']}")
        print(f"stream_bench.spec_accept_rate="
              f"{st['accepted'] / st['drafted']:.4f}")
    return 0


def cmd_compare(args) -> int:
    """Offline vs streaming fidelity (`examples/stream-compare.cpp:100-275`):
    MAE/RMSE/max-abs + best-lag search within +-4096 samples."""
    from .audio.wav import wav_write
    from .runtime.engine import Options
    engine = _make_engine(args)
    voice = _load_voice(args)

    token_text = engine.generate_token_text(args.prompt, _make_options(args))
    opts = Options(skip_llm=True, apply_peak_normalization=False)
    offline = engine.synthesize(voice, token_text, opts)

    chunks = []
    engine.synthesize_stream(voice, token_text,
                             lambda s, sr, last: (chunks.append(s) or True) if s is not None else True,
                             chunk_samples=args.chunk_samples, options=opts)
    streamed = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    if args.output:
        wav_write(args.output + ".offline.wav", offline, engine.sample_rate)
        wav_write(args.output + ".stream.wav", streamed, engine.sample_rate)

    from .audio.metrics import best_lag_rmse, log_spectral_distance, waveform_errors

    print(f"compare.offline_samples={len(offline)}")
    print(f"compare.stream_samples={len(streamed)}")
    if min(len(offline), len(streamed)) == 0:
        return 1
    e = waveform_errors(offline, streamed)
    print(f"compare.mae={e['mae']:.8f}")
    print(f"compare.rmse={e['rmse']:.8f}")
    print(f"compare.max_abs={e['max_abs']:.8f}")
    print(f"compare.lsd_db={log_spectral_distance(offline, streamed):.4f}")
    lag, r = best_lag_rmse(offline, streamed)
    print(f"compare.best_lag_samples={lag}")
    print(f"compare.best_lag_rmse={r:.8f}")
    return 0


def cmd_serve(args) -> int:
    """HTTP TTS server backed by the continuous batcher."""
    import glob
    import os
    from .runtime.engine import VoiceModel
    from .runtime.server import serve
    if getattr(args, "draft_model", ""):
        # speculation is single-stream only; loading the draft would just
        # burn HBM the batched KV cache needs
        print("Warning: --draft-model is ignored by `serve` (speculative "
              "decoding is single-stream; batched serving amortizes weight "
              "reads across slots already)", file=sys.stderr)
        args.draft_model = ""
    engine = _make_engine(args)
    engine.warmup()
    voices = {}
    for path in glob.glob(os.path.join(args.voices_dir, "*.emb.gguf")):
        name = os.path.basename(path).replace(".emb.gguf", "")
        voices[name] = VoiceModel(path)
    if not voices:
        print(f"Error: no *.emb.gguf files in {args.voices_dir}", file=sys.stderr)
        return 1
    serve(engine, voices, host=args.host, port=args.port, n_slots=args.slots,
          request_timeout_sec=(args.request_timeout
                               if args.request_timeout > 0 else None))
    return 0


def cmd_analyze(args) -> int:
    from .audio.analyze import analyze_audio
    from .audio.wav import wav_read
    for path in args.files:
        x, sr = wav_read(path)
        rep = analyze_audio(x, sr)
        print(f"=== {path} ===")
        for k, v in rep.items():
            print(f"  {k}: {v}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="miotts", description=__doc__)
    sub = parser.add_subparsers(dest="command")

    p = sub.add_parser("synth", help="offline text -> WAV")
    _add_model_args(p)
    p.add_argument("-o", "--output", default="output.wav")
    p.add_argument("--dump-tensors", action="store_true")
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("stream", help="stream PCM to a sink (stdout/file)")
    _add_model_args(p)
    p.add_argument("-o", "--output", default="-",
                   help="PCM sink: '-' for stdout, else file path")
    p.add_argument("--chunk-samples", type=int, default=4096)
    p.add_argument("--queue-seconds", type=float, default=10.0)
    p.add_argument("--dump-fed-wav", default="",
                   help="also capture exactly what the sink consumed as WAV")
    p.add_argument("--device", action="store_true",
                   help="play on the host audio device (pw-play/paplay/"
                        "aplay; stream-to-device.cpp equivalent)")
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("bench", help="streaming benchmark")
    _add_model_args(p)
    p.add_argument("--chunk-samples", type=int, default=4096)
    p.add_argument("--trace", default="",
                   help="capture a jax.profiler device trace to this dir")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("compare", help="offline vs streaming fidelity")
    _add_model_args(p)
    p.add_argument("--chunk-samples", type=int, default=4096)
    p.add_argument("-o", "--output", default="")
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("serve", help="HTTP TTS server (continuous batching)")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-c", "--codec", required=True)
    p.add_argument("--voices-dir", required=True,
                   help="directory of *.emb.gguf voice files")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--request-timeout", type=float, default=0.0,
                   help="cancel requests running longer than this many "
                        "seconds (0 = unlimited)")
    p.add_argument("-t", "--temp", type=float, default=0.8)
    p.add_argument("--max-tokens", type=int, default=700)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("analyze", help="WAV health report")
    p.add_argument("files", nargs="+")
    p.set_defaults(fn=cmd_analyze)

    args = parser.parse_args(argv)
    if not getattr(args, "fn", None):
        parser.print_help()
        return 1
    # MIOTTS_PLATFORM=cpu|tpu pins the JAX backend regardless of any
    # environment-level default (this image pins a tunneled TPU via
    # sitecustomize, which ignores JAX_PLATFORMS) — used by the offline
    # parity battery to keep debug runs off the serving chip.
    plat = __import__("os").environ.get("MIOTTS_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

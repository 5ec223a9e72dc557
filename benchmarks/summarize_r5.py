#!/usr/bin/env python3
"""Summarize round-5 matrix logs into markdown table rows.

Parses the LAST JSON line of each benchmarks/matrix_r5/*.log and groups
by entry family (spec_e2e, batch, single, compare/hb, spec_parity,
decode ABAB marginals are grep'd from text).  Purely offline.

Usage: python benchmarks/summarize_r5.py [dir]
"""

import json
import os
import re
import sys


def last_json(path):
    out = None
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and line.endswith("}"):
                    try:
                        out = json.loads(line)
                    except ValueError:
                        pass
    except OSError:
        pass
    return out


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/matrix_r5"
    logs = sorted(f for f in os.listdir(d) if f.endswith(".log"))

    print("## spec end-to-end (bench.py single-stream through the spec path)")
    print("| entry | x_realtime | decode tok/s | ttfa p50 | acceptance | force |")
    print("|---|---|---|---|---|---|")
    for f in logs:
        if not f.startswith("spec_e2e"):
            continue
        j = last_json(os.path.join(d, f))
        if not j:
            print(f"| {f[:-4]} | (no result) | | | | |")
            continue
        sp = j.get("spec", {})
        print(f"| {f[:-4]} | {j.get('value')} | {j.get('decode_tok_s')} | "
              f"{j.get('ttfa_p50_sec')} | {sp.get('acceptance')} | "
              f"{sp.get('force_accept', '')} |")

    print("\n## single-stream entries")
    print("| entry | x_realtime | decode tok/s | ttfa p50 |")
    print("|---|---|---|---|")
    for f in logs:
        if not (f.startswith("single_") or f.startswith("s26_")):
            continue
        j = last_json(os.path.join(d, f))
        if not j:
            print(f"| {f[:-4]} | (no result) | | |")
            continue
        print(f"| {f[:-4]} | {j.get('value')} | {j.get('decode_tok_s')} | "
              f"{j.get('ttfa_p50_sec')} |")

    print("\n## serving entries (bench_batch)")
    print("| entry | aggregate | per-stream | ttfa p50 | reps | dma MB/s |")
    print("|---|---|---|---|---|---|")
    for f in logs:
        if not f.startswith("batch_"):
            continue
        j = last_json(os.path.join(d, f))
        if not j:
            print(f"| {f[:-4]} | (no result) | | | | |")
            continue
        print(f"| {f[:-4]} | {j.get('value')} | {j.get('vs_baseline')} | "
              f"{j.get('ttfa_p50_sec')} | {j.get('agg_all')} | "
              f"{j.get('dma_MBps')} |")

    print("\n## fidelity / holdback sweep (bench_compare)")
    print("| entry | holdback | serve rmse | serve lsd | wire in-range max |")
    print("|---|---|---|---|---|")
    for f in logs:
        if not (f.startswith("compare_") or f.startswith("hb")
                or f.startswith("c26")):
            continue
        j = last_json(os.path.join(d, f))
        if not j:
            print(f"| {f[:-4]} | (no result) | | | |")
            continue
        print(f"| {f[:-4]} | {j.get('holdback')} | "
              f"{j.get('serve', {}).get('rmse')} | "
              f"{j.get('serve', {}).get('lsd_db')} | "
              f"{j.get('wire', {}).get('in_range_max_abs')} |")

    print("\n## spec parity (greedy self-draft path agreement)")
    for f in logs:
        if not f.startswith("spec_parity"):
            continue
        j = last_json(os.path.join(d, f))
        print(f"- {f[:-4]}: {j}")

    print("\n## decode marginals (scan-internal fit)")
    for f in logs:
        if not (f.startswith("decode_") or f.startswith("attn_")
                or f.startswith("chunk_")):
            continue
        with open(os.path.join(d, f)) as fh:
            txt = fh.read()
        for m in re.findall(r"(marginal.*|.*us/layer-call.*|.*ms/step.*|"
                            r".*per-step.*)", txt):
            print(f"- {f[:-4]}: {m.strip()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

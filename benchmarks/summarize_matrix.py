#!/usr/bin/env python3
"""Summarize a measurement-matrix output directory into a markdown table.

Reads every <name>.log under the given dir (default benchmarks/matrix_r2),
pulls the final JSON metric line plus the timed-pass stats (bench_batch) or
the stream_bench/stage lines (bench.py / bench_decode.py), and prints a
compact markdown summary for RESULTS.md.  Entries without a .done marker
are flagged (timeout / contention casualties).

Usage: python benchmarks/summarize_matrix.py [dir]
"""

import json
import os
import re
import sys


def last_json(text: str):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main() -> int:
    d = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/matrix_r2"
    rows = []
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".log"):
            continue
        name = fn[:-4]
        text = open(os.path.join(d, fn), errors="replace").read()
        done = os.path.exists(os.path.join(d, name + ".done"))
        j = last_json(text)
        summary = ""
        if j and "metric" in j:
            extra = (f" ttfa_p50={j['ttfa_p50_sec']:.2f}s"
                     if "ttfa_p50_sec" in j else "")
            summary = (f"{j['metric']}={j['value']}"
                       f" (vs_baseline {j['vs_baseline']}){extra}")
        else:
            m = re.findall(r"per-program overhead.*|marginal .*|"
                           r"weights .*speed-of-light.*", text)
            if m:
                summary = "; ".join(x.strip() for x in m[-2:])
            else:
                m = re.findall(r"bench_batch\[timed\]: .*", text)
                if m:
                    summary = m[-1]
        p50 = re.findall(r"p50 time-to-first-audio = ([0-9.]+)", text)
        if p50:
            summary += f" ttfa_p50={p50[-1]}s"
        toks = re.findall(r"bench.decode_tokens_per_sec = ([0-9.]+)", text)
        if toks:
            summary += f" {float(toks[-1]):.0f} tok/s"
        rows.append((name, "ok" if done else "INCOMPLETE", summary))
    w = max(len(r[0]) for r in rows) if rows else 8
    print(f"| {'entry':{w}} | state | result |")
    print(f"|{'-' * (w + 2)}|-------|--------|")
    for name, state, summary in rows:
        print(f"| {name:{w}} | {state} | {summary} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Compare a Bench JSON line (or BENCH_r*.json driver artifact) against
the consolidated per-query baseline table in BASELINE.md.

Usage: python3 tools/bench_compare.py <bench.json-or-log> [threshold]

Prints per-query ratio vs the baseline, flagging entries above the
threshold (default 2.0 — the per-query gate). Queries absent from the
baseline table (added after the consolidation) are listed separately.
Remember the box's contention envelope: same-code totals have measured
41-170 s — re-run before concluding a regression from one pass.
"""
import json
import re
import sys


def load_bench(path: str) -> dict:
    txt = open(path).read()
    # driver artifact: {"tail": "...{\"metric\":\"total\"...}"} or a raw log
    try:
        obj = json.loads(txt)
        if isinstance(obj, dict) and "queries" in obj:
            return obj
        if isinstance(obj, dict) and "tail" in obj:
            txt = obj["tail"]
    except json.JSONDecodeError:
        pass
    i = txt.rfind('{"metric":"total"')
    if i < 0:
        sys.exit(f"no bench JSON line found in {path}")
    d, _ = json.JSONDecoder().raw_decode(txt[i:])
    return d


def load_baseline(path: str = "BASELINE.md") -> dict:
    txt = open(path).read()
    i = txt.rfind("CONSOLIDATED full-plan baseline")
    if i < 0:
        sys.exit("no consolidated baseline table in BASELINE.md")
    base = {}
    for q, sec in re.findall(r"\|\s*((?:q\d+|cau_\w+))\s*\|\s*([0-9.]+)\s*",
                             txt[i:]):
        base[q] = float(sec)
    return base


def main() -> int:
    bench = load_bench(sys.argv[1])
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    base = load_baseline()
    qs = bench["queries"]
    flagged, new = [], []
    def sort_key(k):
        m = re.match(r"q(\d+)", k)
        return (0, int(m.group(1)), k) if m else (1, 0, k)
    for q in sorted(qs, key=sort_key):
        m = re.match(r"q\d+", q)
        short = m.group(0) if m else q
        if short not in base:
            new.append((q, qs[q]))
            continue
        ratio = qs[q] / base[short] if base[short] > 0 else float("inf")
        if ratio > thresh:
            flagged.append((q, qs[q], base[short], ratio))
    print(f"{len(qs)} benched, {len(qs) - len(new)} compared, "
          f"{len(new)} not in baseline, {len(flagged)} above {thresh}x")
    for q, got, exp, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"  FLAG {q}: {got:.2f}s vs baseline {exp:.2f}s = {r:.2f}x")
    for q, got in new:
        print(f"  NEW  {q}: {got:.2f}s (no baseline figure yet)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())

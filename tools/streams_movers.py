#!/usr/bin/env python3
"""Streams regression gate: compare the per-drive throughput block of two
full bench artifacts (BENCH_METRIC.json generations — the driver's
BENCH_r{N}.json wrappers capture only the compact tail line, which
carries no streams block; diff committed metric files instead:
`python3 tools/streams_movers.py <(git show <prev-round>:BENCH_METRIC.json)
BENCH_METRIC.json`) and flag spread-adjusted drops, the way the
round-close query mover table does.

A drive REGRESSES when its rows/sec falls by more than 2x AND the
per-drive sec delta exceeds the noise band (sum of both runs' recorded
spreads) — a drop inside the band is session noise, not a code signal.

Usage: python3 tools/streams_movers.py OLD.json NEW.json
Exit 1 if any drive regresses (usable as a gate), 0 otherwise.
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # bench artifacts are one JSON object per line; take the first line
    # that parses and carries a streams block
    for line in txt.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "streams" in d:
            return d["streams"]
    raise SystemExit(f"no streams block found in {path}")


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    rows = []
    regressed = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if not o or not n or o.get("rows", -1) < 0 or n.get("rows", -1) < 0:
            rows.append((name, "missing/crashed", "", "", ""))
            if n is None or n.get("rows", -1) < 0:
                regressed.append(name)
            continue
        o_rps, n_rps = o["rows_per_sec"], n["rows_per_sec"]
        ratio = o_rps / n_rps if n_rps > 0 else float("inf")
        band = o.get("spread", 0.0) + n.get("spread", 0.0)
        delta = n["sec"] - o["sec"]
        flag = ratio > 2.0 and delta > band
        if flag:
            regressed.append(name)
        rows.append((name, f"{o_rps:.1f}", f"{n_rps:.1f}",
                     f"{ratio:.2f}x" if ratio != float("inf") else "inf",
                     "REGRESSED" if flag
                     else ("noise-band" if ratio > 2.0 else "ok")))
    w = max(len(r[0]) for r in rows)
    print(f"| {'drive'.ljust(w)} | old rows/s | new rows/s | old/new | verdict |")
    print(f"|{'-' * (w + 2)}|---|---|---|---|")
    for r in rows:
        print(f"| {r[0].ljust(w)} | {r[1]} | {r[2]} | {r[3]} | {r[4]} |")
    if regressed:
        print(f"\nREGRESSED ({len(regressed)}): {', '.join(regressed)}")
        sys.exit(1)
    print("\nno spread-adjusted throughput regressions")


if __name__ == "__main__":
    main()

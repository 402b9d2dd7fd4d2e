#!/usr/bin/env bash
# Round-close checklist, foldable into one command so no step can be
# skipped (VERDICT r15 items 2 and 8). Runs the full correctness gate,
# the signed-zero sweep, the SAME-round DuckDB anchor refresh, and the
# bench — then commits every close artifact in ONE commit so the
# committed history and the judged artifacts can never drift apart.
#
# Usage: tools/close.sh <round-number> [sf-dir]
#   tools/close.sh 16                # full close at sf0.1
#
# Manual step the script CHECKS but cannot author: the BASELINE.md
# round row + ratio-series entry and the Bench.scala `history` seq for
# this round must be written before running (the script greps for the
# round tag and refuses to commit without it).
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND=${1:?usage: tools/close.sh <round-number> [sf-dir]}
SF=${2:-/root/testdata/sf0.1}
OUT=/tmp/verify_close_r${ROUND}

# Check the manual prerequisite UP FRONT (ADVICE r16): failing on the
# missing BASELINE.md row only after ~an hour of verify+bench wastes
# the run. (The row needs this close's numbers, so first closes of a
# round legitimately run with CLOSE_ALLOW_NO_ROW=1, write the row from
# the fresh artifacts, and re-run the commit step.)
if [ -z "${CLOSE_ALLOW_NO_ROW:-}" ]; then
  grep -qE "^\| *r${ROUND} " BASELINE.md || {
    echo "ERROR: BASELINE.md has no r${ROUND} row — write it first, or" \
         "set CLOSE_ALLOW_NO_ROW=1 to defer the check to the commit step"
    exit 1; }
fi

echo "== [1/6] full Verify dump at $SF =="
sbt -batch "runMain graft.Verify $SF $OUT"

echo "== [2/6] DuckDB correctness gate =="
python3 tools/oracle_check.py "$OUT" "$SF" | tail -3

echo "== [3/6] signed-zero sweep (both engines) =="
python3 tools/zero_sweep.py "$OUT" "$SF"

echo "== [4/6] SAME-round anchor refresh -> BASELINE_LOCAL.json =="
python3 tools/oracle_bench.py "$OUT" "$SF" > BASELINE_LOCAL.json
grep -o '"value": *[0-9.]*' BASELINE_LOCAL.json | head -1

echo "== [5/6] bench -> BENCH_METRIC.json =="
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" \
  | tail -2

echo "== [6/6] close commit (one commit, all artifacts) =="
grep -qE "^\| *r${ROUND} " BASELINE.md || {
  echo "ERROR: BASELINE.md has no r${ROUND} row — write the round row" \
       "and ratio-series entry first (close discipline item 8)"; exit 1; }
# commit with EXPLICIT pathspecs (ADVICE r16): a bare `git commit`
# after blanket adds would also sweep in anything previously staged —
# the 'one commit, all artifacts' guarantee must not smuggle unrelated
# changes. The driver writes BENCH_r{N}/CORRECTNESS_r{N} after judging
# previous rounds — include whichever exist so none stays untracked.
ART=(BENCH_METRIC.json BASELINE_LOCAL.json BASELINE.md SCALING.md)
for f in BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json; do
  [ -e "$f" ] && ART+=("$f")
done
git add -- "${ART[@]}"
git commit -m "round ${ROUND} close: bench + same-round anchor + artifacts" \
  -- "${ART[@]}"
git log --oneline -1

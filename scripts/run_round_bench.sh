#!/bin/bash
# End-of-round bench + cross-round diff gate (r12 verdict directive #7).
#
# Runs the full-suite bench with the round-stamped detail artifact, then
# diffs it against the previous round's committed detail with the
# gc-aware verdict column gating: the script FAILS LOUDLY iff a >1.5x
# regression has flat per-run GC (a real plan regression), and stays
# quiet on the jvm-pressure / host-noise signatures the r11/r12 verdicts
# spent sessions hand-triaging.
#
# Usage: run_round_bench.sh <roundN> [prevRound] [query_keys.json]
# (from /root/repo). With a query_keys.json (graft.Verify dumps one per
# run), the diff gate also asserts the new detail benched EXACTLY
# SparkEntry.queries — the merge_gate_logs set-equality discipline.
set -euo pipefail
N=$1
PREV=${2:-$((N - 1))}
KEYS=${3:-}
SPARK_GRAFT_ROUND=$N SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
python3 scripts/bench_diff.py "BENCH_DETAIL_r$PREV.json" \
  "BENCH_DETAIL_r$N.json" "BENCH_DIFF_r${PREV}_r${N}.json" --gate \
  ${KEYS:+--expect "$KEYS"} |
  tee "BENCH_DIFF_r${PREV}_r${N}.txt"

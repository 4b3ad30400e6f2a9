#!/usr/bin/env bash
# Close-of-round gate (round-8 verdict #2: the snapshot commit added
# queries that were never run and broke 7 tests). Run this BEFORE the
# end-of-round snapshot commit; it fails loudly on any red signal and
# writes CLOSE_GATE.log at the repo root — commit the log with the
# snapshot so the round demonstrably ran the suite.
#
#   tools/close_round.sh            # full gate: suite + oracle + bench
#   tools/close_round.sh --no-bench # suite + oracle only (bench already
#                                   # fresh in BENCH_SELF.json)
set -euo pipefail
cd "$(dirname "$0")/.."
LOG=CLOSE_GATE.log
: > "$LOG"
note() { echo "$@" | tee -a "$LOG"; }

note "== close-of-round gate @ $(git rev-parse --short HEAD)" \
  "$(date -u +%FT%TZ) =="

note "-- sbt test --"
sbt -batch test 2>&1 | grep -E "^\[info\] (Tests:|All tests|\*\*\*)" \
  | tee -a "$LOG"
grep -q "All tests passed." "$LOG" || { note "GATE RED: suite failed"; exit 1; }

note "-- Verify + DuckDB oracle (sf0.01) --"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/close_verify" \
  2>&1 | grep '\[verify\]' | tee -a "$LOG" || true
python3 tools/check.py /root/testdata/sf0.01 /tmp/close_verify \
  | tail -3 | tee -a "$LOG"
grep -q "^FAILS: 0" "$LOG" || { note "GATE RED: oracle check failed"; exit 1; }

if [[ "${1:-}" != "--no-bench" ]]; then
  note "-- Bench (sf0.1, writes BENCH_SELF.json) --"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | tee -a "$LOG"
  grep -q '"failed":\[\]' "$LOG" || { note "GATE RED: bench failures"; exit 1; }
fi

note "== GATE GREEN =="

#!/usr/bin/env bash
# Round-gate runner: the three gates every round must record BEFORE the
# snapshot commit (VERDICT r12 item 1 — round evidence must be
# self-contained; the driver's capture artifacts have come back empty
# before, so the repo keeps its own record).
#
#   1. sbt -batch test                      (full ScalaTest suite)
#   2. graft.Verify sf0.01 + compare_oracle (the driver's DuckDB t2 mirror)
#   3. graft.Bench at sf0.1                 (builder bench -> bench.json)
#
# Usage: scripts/gates.sh <round-number>
# Appends a dated "Round <N> gates" block to BASELINE.md and leaves the
# builder bench.json at the repo root for the commit. Exits non-zero on
# the first red gate.
set -uo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/gates.sh <round-number>}"
SF_VERIFY=/root/testdata/sf0.01
SF_BENCH=/root/testdata/sf0.1
OUT=/tmp/gates_out
LOG=/tmp/gates_r${ROUND}.log
: > "$LOG"

echo "== gate 1/3: sbt test ==" | tee -a "$LOG"
sbt -batch test 2>&1 | tail -5 | tee -a "$LOG"
TESTS_LINE=$(grep -E "Tests: succeeded" "$LOG" | tail -1 || true)
if ! grep -qE "All tests passed" "$LOG"; then
  echo "GATE 1 RED — stopping" | tee -a "$LOG"; exit 1
fi

echo "== gate 2/3: Verify + oracle mirror ==" | tee -a "$LOG"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF_VERIFY $OUT" 2>&1 | tail -3 >> "$LOG"
# compare_oracle exits 1 on any FAIL; its last line is "N pass, N fail, N rows-only"
if ! ORACLE_LINE=$(python3 scripts/compare_oracle.py "$SF_VERIFY" "$OUT" | tail -1); then
  echo "oracle mirror: $ORACLE_LINE" | tee -a "$LOG"
  echo "GATE 2 RED — stopping" | tee -a "$LOG"; exit 1
fi
echo "oracle mirror: $ORACLE_LINE" | tee -a "$LOG"

echo "== gate 3/3: builder bench sf0.1 ==" | tee -a "$LOG"
SPARK_GRAFT_SF_DIR="$SF_BENCH" SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -3 >> "$LOG"
BENCH_LINE=$(python3 - <<'EOF'
import json
b = json.load(open("bench.json"))
q = b.get("queries", {})
print(f'{b.get("value"):.1f} s / {len(q)} queries / errors={sum(1 for v in q.values() if v is None or v < 0)}')
EOF
)
echo "bench: $BENCH_LINE" | tee -a "$LOG"

{
  echo ""
  echo "## Round ${ROUND} gates ($(date -u +%Y-%m-%d))"
  echo ""
  echo "- tests: ${TESTS_LINE:-see $LOG}"
  echo "- oracle mirror (sf0.01): ${ORACLE_LINE}"
  echo "- builder bench (sf0.1, local[32]): ${BENCH_LINE} — committed bench.json"
} >> BASELINE.md
echo "Appended Round ${ROUND} gate block to BASELINE.md"

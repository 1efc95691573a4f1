#!/usr/bin/env bash
# Nightly gate: the full local verification a maintainer runs before
# trusting a day's work. One command, two artifacts:
#   1. full pytest with Hypothesis in EXPLORE mode (fresh-seeded 48
#      examples per property instead of the derandomized CI profile)
#   2. the fulleval bench (ONE JSON line, appended with a timestamp to
#      scripts/nightly_bench.jsonl)
# Exit code is nonzero if either stage fails. ~50 min on local[32].
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== nightly: pytest (Hypothesis explore profile) ==="
SPARK_GRAFT_HYPOTHESIS_EXPLORE=1 SPARK_GRAFT_REQUIRE_JDBC=1 \
  SPARK_GRAFT_REQUIRE_STATEFUL=1 python -m pytest tests/ -q
pytest_rc=$?

echo "=== nightly: fulleval bench ==="
bench_json=$(python bench.py) || { echo "bench failed"; exit 1; }
echo "$bench_json"
printf '{"ts": "%s", "bench": %s}\n' \
  "$(date -u +%Y-%m-%dT%H:%M:%SZ)" "$bench_json" \
  >> scripts/nightly_bench.jsonl

echo "=== nightly: regression gate (vs previous row) ==="
python scripts/nightly_gate.py
gate_rc=$?

if [ $pytest_rc -ne 0 ]; then
  echo "nightly: PYTEST FAILED (rc=$pytest_rc)"
  exit $pytest_rc
fi
if [ $gate_rc -ne 0 ]; then
  echo "nightly: BENCH REGRESSION (rc=$gate_rc)"
  exit $gate_rc
fi
echo "nightly: green"

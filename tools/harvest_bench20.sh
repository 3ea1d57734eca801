#!/bin/bash
# Copy the detached 2^20 rerun output into the tracked artifact once it
# completes (the run prints its ONE json line only at the end).
cd "$(dirname "$0")/.."
if [ -s bench20_rerun.out ] && python -c "import json,sys; json.load(open('bench20_rerun.out'))" 2>/dev/null; then
  cp bench20_rerun.out bench_e2e_20.json
  echo "harvested"
else
  echo "not ready"
fi

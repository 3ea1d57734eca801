#!/bin/bash
# One-shot real-chip measurement campaign (run when the axon tunnel is up).
# Captures every artifact BASELINE.md/VERDICT.md ask for:
#   1. verified MSM throughput (bench.py, incl. 2^18-2^22 sweep + hot shape)
#   2. speed-of-light per-kernel table -> docs/SPEED_OF_LIGHT.md
#   3. SNARK e2e at 2^16 -> bench_e2e_16.json
#   4. SNARK e2e at keyless scale 2^20 -> bench_e2e_20.json
# Each step appends to tools/chip_campaign.log; steps are independent so a
# tunnel drop mid-campaign keeps earlier artifacts.
set -x
cd "$(dirname "$0")/.."
LOG=tools/chip_campaign.log
echo "=== campaign start $(date -u +%FT%TZ)" >> "$LOG"

SPARTAN_BENCH_ROWS=2048 SPARTAN_BENCH_SWEEP=18,20,22 \
  timeout 2400 python bench.py >> "$LOG" 2>&1

timeout 2400 python tools/sol_report.py --out docs/SPEED_OF_LIGHT.md >> "$LOG" 2>&1

timeout 4800 python -m spartan_tpu.io.keyless_bench --synthetic 16 --json \
  > bench_e2e_16.json 2>> "$LOG"

timeout 9600 python -m spartan_tpu.io.keyless_bench --synthetic 20 --json \
  > bench_e2e_20.json 2>> "$LOG"

echo "=== campaign done $(date -u +%FT%TZ)" >> "$LOG"

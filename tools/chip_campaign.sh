#!/bin/bash
# One-shot real-chip measurement campaign (run when the axon tunnel is up).
# Captures every artifact BASELINE.md/VERDICT.md ask for:
#   1. SNARK e2e at 2^16, run TWICE -> bench_e2e_16.json is the warm run
#      (the cold run is kept as bench_e2e_16_cold.json)
#   2. SNARK e2e at keyless scale 2^20, twice -> bench_e2e_20.json (warm)
#      + bench_e2e_20_cold.json
#   3. verified MSM throughput (bench.py, incl. 2^18-2^22 sweep + hot shape)
#   4. speed-of-light per-kernel table -> docs/SPEED_OF_LIGHT.md
# Each step appends to tools/chip_campaign.log; steps are independent so a
# tunnel drop mid-campaign keeps earlier artifacts.
#
# Run this only on a FROZEN tree: any spartan_tpu/*.py edit between the
# cold and warm runs invalidates the AOT executable cache and the "warm"
# run silently re-traces everything.
set -x
cd "$(dirname "$0")/.."
LOG=tools/chip_campaign.log
echo "=== campaign start $(date -u +%FT%TZ)" >> "$LOG"

timeout 4800 python -m spartan_tpu.io.keyless_bench --synthetic 16 --json \
  > bench_e2e_16_cold.json 2>> "$LOG"
echo "--- e2e 16 cold rc=$? $(date -u +%T)" >> "$LOG"
timeout 2400 python -m spartan_tpu.io.keyless_bench --synthetic 16 --json \
  > bench_e2e_16.json 2>> "$LOG"
echo "--- e2e 16 warm rc=$? $(date -u +%T)" >> "$LOG"

timeout 9600 python -m spartan_tpu.io.keyless_bench --synthetic 20 --json \
  > bench_e2e_20_cold.json 2>> "$LOG"
echo "--- e2e 20 cold rc=$? $(date -u +%T)" >> "$LOG"
timeout 7200 python -m spartan_tpu.io.keyless_bench --synthetic 20 --json \
  > bench_e2e_20.json 2>> "$LOG"
echo "--- e2e 20 warm rc=$? $(date -u +%T)" >> "$LOG"

timeout 4800 python -m spartan_tpu.io.keyless_bench --synthetic 16 --pcs kzg --json \
  > bench_e2e_16_kzg_cold.json 2>> "$LOG"
echo "--- e2e 16 kzg cold rc=$? $(date -u +%T)" >> "$LOG"
timeout 2400 python -m spartan_tpu.io.keyless_bench --synthetic 16 --pcs kzg --json \
  > bench_e2e_16_kzg.json 2>> "$LOG"
echo "--- e2e 16 kzg warm rc=$? $(date -u +%T)" >> "$LOG"

SPARTAN_BENCH_ROWS=2048 SPARTAN_BENCH_SWEEP=18,20,22,24 \
  timeout 4800 python bench.py >> "$LOG" 2>&1
echo "--- bench rc=$? $(date -u +%T)" >> "$LOG"

timeout 2400 python tools/sol_report.py --out docs/SPEED_OF_LIGHT.md >> "$LOG" 2>&1
echo "--- sol rc=$? $(date -u +%T)" >> "$LOG"

echo "=== campaign done $(date -u +%FT%TZ)" >> "$LOG"

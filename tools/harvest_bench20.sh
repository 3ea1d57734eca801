#!/bin/bash
# Launch/harvest the keyless-scale (2^20) synthetic benchmark.
#
#   tools/harvest_bench20.sh start [out.json]  # detached run -> /tmp scratch
#   tools/harvest_bench20.sh [out.json]        # harvest once complete
#
# The bench prints its ONE json report line at the very end; harvesting
# takes the last stdout line that parses as JSON so stray warnings can't
# wedge the harvest, and a non-empty non-JSON file reports a distinct
# "malformed" diagnostic instead of "not ready" forever.
cd "$(dirname "$0")/.."
SCRATCH=/tmp/bench20_rerun.out
if [ "$1" = start ]; then
  ART="${2:-bench_e2e_20.json}"
  : > "$SCRATCH"
  nohup python -m spartan_tpu.io.keyless_bench --synthetic 20 --json \
    > "$SCRATCH" 2>/tmp/bench20_rerun.err &
  echo "started pid $! -> harvest into $ART when done"
  exit 0
fi
ART="${1:-bench_e2e_20.json}"
if [ ! -s "$SCRATCH" ]; then
  echo "not ready (no output yet)"
  exit 1
fi
python - "$SCRATCH" "$ART" <<'EOF'
import json, sys
lines = [l for l in open(sys.argv[1]).read().splitlines() if l.strip()]
for line in reversed(lines):
    try:
        json.loads(line)
    except ValueError:
        continue
    open(sys.argv[2], "w").write(line + "\n")
    print(f"harvested -> {sys.argv[2]}")
    sys.exit(0)
print("malformed output (no JSON line); first line:")
print(lines[0][:200])
sys.exit(1)
EOF

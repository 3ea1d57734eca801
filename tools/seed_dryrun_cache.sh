#!/bin/bash
# Re-seed the COMMITTED dryrun compile cache (dryrun_cache/).
#
# __graft_entry__.py points the CPU multichip dryrun's persistent compile
# cache at dryrun_cache/ so a clean checkout skips ~500 s of XLA:CPU
# compiles (driver timeout). Entries are keyed by HLO + flags + jax
# versions: any kernel-code edit orphans the old entries, so re-run this
# after touching spartan_tpu/ops, core/sumcheck*, or parallel/ — it wipes
# the dir, runs the dryrun cold once (slow, expected), then runs it again
# and reports the warm time which is what the driver will see.
set -e
cd "$(dirname "$0")/.."
rm -rf dryrun_cache
mkdir -p dryrun_cache
echo "--- seed run (cold compiles, several minutes on 1 core)"
time python __graft_entry__.py
echo "--- warm verification run (this is the driver-visible time)"
time timeout 240 python __graft_entry__.py
echo "--- cache size:"
du -sh dryrun_cache

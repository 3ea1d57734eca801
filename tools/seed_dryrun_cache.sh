#!/bin/bash
# Re-seed the COMMITTED dryrun compile cache (dryrun_cache/).
#
# __graft_entry__.py points the CPU multichip dryrun's persistent compile
# cache at dryrun_cache/ so a clean checkout skips ~500 s of XLA:CPU
# compiles (driver timeout). Cache keys are checkout-path-independent
# (JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES=none), but the MODULE SET a run
# compiles depends on local state: a checkout with a warm .spartan_cache/
# (generator tables, native .so) skips the derivation kernels a truly
# fresh checkout must compile. So the seed runs in a CLEAN CLONE, and the
# result is validated in a SECOND clean clone under the driver's timeout.
# Re-run after touching spartan_tpu/ops, core/sumcheck*, or parallel/.
set -e
cd "$(dirname "$0")/.."
REPO=$(pwd)
SEED=$(mktemp -d /tmp/spartan_seed.XXXX)
trap 'rm -rf "$SEED"' EXIT

git clone -q "$REPO" "$SEED/a"
rm -rf "$SEED/a/dryrun_cache"
mkdir -p "$SEED/a/dryrun_cache"
echo "--- seed run in clean clone (cold compiles; several minutes on 1 core)"
(cd "$SEED/a" && time python __graft_entry__.py)

echo "--- install into $REPO/dryrun_cache"
rm -rf "$REPO/dryrun_cache"
cp -r "$SEED/a/dryrun_cache" "$REPO/dryrun_cache"
du -sh "$REPO/dryrun_cache"

echo "--- driver-equivalent validation: fresh clone + committed cache, timeout 240"
git clone -q "$REPO" "$SEED/b"
rm -rf "$SEED/b/dryrun_cache"
cp -r "$REPO/dryrun_cache" "$SEED/b/dryrun_cache"
(cd "$SEED/b" && time timeout 240 python __graft_entry__.py)
echo "--- validation OK"

#!/bin/bash
# Canonical test invocation: the suite in THREE separate processes.
#
# One process running all ~28 modules accumulates enough XLA:CPU compiler
# state to segfault partway through on small machines (reproduced at the
# same test 3x, each module green in isolation; conftest.py's per-module
# jax.clear_caches() mitigates but process isolation is the robust fix).
# Exit code is non-zero if any group fails.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_curve.py tests/test_field.py tests/test_hyrax.py \
  tests/test_kzg.py tests/test_mle.py tests/test_mont_variants.py \
  tests/test_msm.py tests/test_msm_seq.py tests/test_nizk_e2e.py \
  tests/test_nizk_protocols.py -x -q "$@"
python -m pytest tests/test_parallel.py tests/test_product_tree.py \
  tests/test_r1cs_reader.py tests/test_reference_vectors.py \
  tests/test_serialization_roundtrip.py -x -q "$@"
python -m pytest tests/test_snark_e2e.py tests/test_snark_midsize.py \
  tests/test_sumcheck.py tests/test_tpu_kernels.py tests/test_transcript.py \
  tests/test_transcript_device.py tests/test_unipoly.py -x -q "$@"

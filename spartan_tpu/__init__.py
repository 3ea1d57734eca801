"""spartan_tpu — a TPU-native Spartan zkSNARK prover/verifier for BN254.

From-scratch JAX/XLA implementation with the capabilities of the Rust
reference Antiparadox/Spartan-BN254 (see SURVEY.md): NIZK + SNARK proof
systems over Circom R1CS, Hyrax and KZG polynomial commitments, batched
limb-decomposed field/curve kernels, and pod-scale sharding hooks.
"""

import os

# Persistent XLA compilation cache: the limb kernels are cheap to compile
# individually but numerous; caching makes repeat runs/tests near-instant.
if os.environ.get("SPARTAN_TPU_NO_COMPILE_CACHE") != "1":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/spartan_tpu_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

__version__ = "0.1.0"

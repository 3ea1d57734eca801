"""spartan_tpu — a TPU-native Spartan zkSNARK prover/verifier for BN254.

From-scratch JAX/XLA implementation with the capabilities of the Rust
reference Antiparadox/Spartan-BN254 (see SURVEY.md): NIZK + SNARK proof
systems over Circom R1CS, Hyrax and KZG polynomial commitments, batched
limb-decomposed field/curve kernels, and pod-scale sharding hooks.
"""

import os

# Persistent XLA compilation cache: the limb kernels are cheap to compile
# individually but numerous; caching makes repeat runs/tests near-instant.
# Keyed per platform AND per host CPU fingerprint: the axon remote-compile
# helper produces CPU AOT artifacts with the terminal machine's CPU
# features, and loading those in a process on a different machine SIGSEGVs
# ("machine feature mismatch" loader warning).
if os.environ.get("SPARTAN_TPU_NO_COMPILE_CACHE") != "1":
    _plat = (os.environ.get("SPARTAN_TPU_PLATFORM")
             or os.environ.get("JAX_PLATFORMS", "default")).replace(",", "_") or "auto"

    def _cpu_fingerprint() -> str:
        import hashlib
        try:
            with open("/proc/cpuinfo", "rb") as _f:
                for _line in _f:
                    if _line.startswith(b"flags"):
                        return hashlib.sha256(_line).hexdigest()[:8]
        except OSError:
            pass
        import platform as _platform
        return hashlib.sha256(_platform.processor().encode()).hexdigest()[:8]

    from spartan_tpu.utils.cachedir import subdir as _cache_subdir

    _cache_dir = _cache_subdir(f"jax_cache_{_plat}_{_cpu_fingerprint()}")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    # if jax was imported before this package, its config already captured
    # the (possibly unset) env — apply explicitly in that case
    import sys as _sys

    if "jax" in _sys.modules:
        _sys.modules["jax"].config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        _sys.modules["jax"].config.update(
            "jax_persistent_cache_min_compile_time_secs", 0)
        # keep checkout paths out of cache keys (GPU-only autotune dir)
        _sys.modules["jax"].config.update(
            "jax_persistent_cache_enable_xla_caches", "")

# Platform override that actually sticks: this jax build ignores the
# JAX_PLATFORMS env var once the axon TPU plugin registers, and the tunnel
# can hang device init for hours — SPARTAN_TPU_PLATFORM=cpu forces the
# config-level override for CLI runs (tests do the same in conftest.py).
_plat_override = os.environ.get("SPARTAN_TPU_PLATFORM")
if _plat_override:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat_override)

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy re-exports mirroring the reference's public API surface
    (/root/reference/src/lib.rs:38-59) without forcing jax init on import.
    """
    _exports = {
        # snark.rs surface
        "Assignment": ("spartan_tpu.snark", "Assignment"),
        "VarsAssignment": ("spartan_tpu.snark", "VarsAssignment"),
        "InputsAssignment": ("spartan_tpu.snark", "InputsAssignment"),
        "Instance": ("spartan_tpu.snark", "Instance"),
        "NIZK": ("spartan_tpu.snark", "NIZK"),
        "NIZKGens": ("spartan_tpu.snark", "NIZKGens"),
        "SNARK": ("spartan_tpu.snark", "SNARK"),
        "SNARKGens": ("spartan_tpu.snark", "SNARKGens"),
        # core protocol objects
        "R1CSShape": ("spartan_tpu.core.r1cs", "R1CSShape"),
        "R1CSGens": ("spartan_tpu.core.r1csproof", "R1CSGens"),
        "R1CSProof": ("spartan_tpu.core.r1csproof", "R1CSProof"),
        "DensePolynomial": ("spartan_tpu.core.mle", "DensePolynomial"),
        "EqPolynomial": ("spartan_tpu.core.mle", "EqPolynomial"),
        "MultiCommitGens": ("spartan_tpu.core.commitments", "MultiCommitGens"),
        "GroupElem": ("spartan_tpu.core.group", "GroupElem"),
        "SumcheckInstanceProof": ("spartan_tpu.core.sumcheck", "SumcheckInstanceProof"),
        "ZKSumcheckInstanceProof": ("spartan_tpu.core.sumcheck", "ZKSumcheckInstanceProof"),
        "UniPoly": ("spartan_tpu.core.unipoly", "UniPoly"),
        "CompressedUniPoly": ("spartan_tpu.core.unipoly", "CompressedUniPoly"),
        "PolyCommitmentGens": ("spartan_tpu.pcs.hyrax", "PolyCommitmentGens"),
        "PolyEvalProof": ("spartan_tpu.pcs.hyrax", "PolyEvalProof"),
        "KZGSrs": ("spartan_tpu.pcs.kzg", "KZGSrs"),
        # utilities
        "Transcript": ("spartan_tpu.utils.transcript", "Transcript"),
        "RandomTape": ("spartan_tpu.utils.random_tape", "RandomTape"),
        "ProofVerifyError": ("spartan_tpu.utils.errors", "ProofVerifyError"),
        "R1CSError": ("spartan_tpu.utils.errors", "R1CSError"),
        "Timer": ("spartan_tpu.utils.timer", "Timer"),
        "SpartanConfig": ("spartan_tpu.config", "SpartanConfig"),
        # ingestion
        "R1CSFile": ("spartan_tpu.io.r1cs_reader", "R1CSFile"),
        "parse_wtns": ("spartan_tpu.io.r1cs_reader", "parse_wtns"),
    }
    if name in _exports:
        import importlib

        mod, attr = _exports[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'spartan_tpu' has no attribute {name!r}")

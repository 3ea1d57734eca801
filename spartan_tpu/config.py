"""Runtime configuration — replaces the reference's Cargo feature flags.

The reference configures via compile-time features (`parallel`, `serde`,
`kzg`; SURVEY.md §5 "Config / flag system"). Python has no #[cfg], so the
switches are a dataclass threaded through gens constructors plus env-var
defaults: PCS mode, MSM window, mesh shape, SRS path/seed, profiling.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _default_srs_path() -> str:
    from spartan_tpu.utils.cachedir import subdir

    return os.path.join(subdir("srs"), "spartan_tpu_srs.npz")


@dataclass
class SpartanConfig:
    # polynomial commitment scheme for the derefs/eval path: 'hyrax' | 'kzg'
    pcs: str = os.environ.get("SPARTAN_TPU_PCS", "hyrax")
    # KZG SRS location + deterministic test seed (kzg.rs:58-63 analog)
    srs_path: str = field(default_factory=lambda: os.environ.get(
        "SPARTAN_TPU_SRS") or _default_srs_path())
    srs_seed: int = int(os.environ.get("SPARTAN_TPU_SRS_SEED", str(0xDEADBEEF)))
    # MSM window size override (None = auto by size)
    msm_window: int | None = None
    # number of mesh devices for sharded proving (None = all available)
    mesh_devices: int | None = None
    # profiling (utils.timer.Timer)
    profile: bool = os.environ.get("SPARTAN_TPU_PROFILE") == "1"

    def __post_init__(self):
        assert self.pcs in ("hyrax", "kzg"), f"unknown PCS mode: {self.pcs}"


DEFAULT = SpartanConfig()

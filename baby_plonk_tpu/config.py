"""Central configuration (SURVEY.md §5: the reference hardcodes everything —
MSM window setup.rs:36, cosets prover.rs:99-100, transcript domain — and has
no config system; here one dataclass carries every tunable).

Values come from environment variables at first access; callers may also
construct and install a Config explicitly (tests do).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class Config:
    #: "host" (exact Python oracle) or "tpu" (JAX kernels)
    engine: str = field(default_factory=lambda: os.environ.get("BPT_ENGINE", "host"))
    #: directory for cached SRS pickles (protocol/setup.py)
    srs_cache_dir: str = field(
        default_factory=lambda: os.environ.get(
            "BPT_SRS_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "baby_plonk_tpu"),
        )
    )
    #: keep the reference's mid-pipeline invariant checks (z(w^n)=1,
    #: r(zeta)=0, exact-division remainders — prover.rs:319,615). They cost
    #: host syncs on the TPU path; disable for max-throughput production runs.
    debug_asserts: bool = field(
        default_factory=lambda: os.environ.get("BPT_DEBUG_ASSERTS", "1") != "0"
    )
    #: device count for the distributed path (None = all visible devices)
    mesh_devices: int | None = field(
        default_factory=lambda: (
            int(os.environ["BPT_MESH_DEVICES"])
            if os.environ.get("BPT_MESH_DEVICES")
            else None
        )
    )
    #: generic MSM algorithm: "bitserial" (default) or "pippenger"
    #: (sorted-bucket method, ops/msm_pippenger.py)
    msm_algorithm: str = field(
        default_factory=lambda: os.environ.get("BPT_MSM", "bitserial")
    )
    #: use precomputed fixed-base tables for KZG commits (ops/msm_fixed.py;
    #: ~8x fewer point-add lanes than bitserial, tables cached per SRS).
    #: BPT_MSM_FIXED=0 falls back to the generic MSM.
    commit_fixed_base: bool = field(
        default_factory=lambda: os.environ.get("BPT_MSM_FIXED", "1") != "0"
    )
    #: coset constants (prover.rs:99-100; verifier.rs:76-77)
    k1: int = 2
    k2: int = 3
    #: Fiat-Shamir domain separator (prover.rs:112)
    transcript_domain: bytes = b"plonk"


_config: Config | None = None


def get_config() -> Config:
    global _config
    if _config is None:
        _config = Config()
    return _config


def set_config(cfg: Config) -> None:
    global _config
    _config = cfg

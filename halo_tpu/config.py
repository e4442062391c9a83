"""Runtime configuration (SURVEY §5: promote scattered knobs to a config
object).

This module is the SINGLE read point for every environment knob: the hot
modules import their module-level constants FROM `get_config()` at import
time (pcdl.DEVICE_MSM_MIN, hostpoly.NTT_DEVICE_MIN, protocol.
PROVER_DEVICE_MIN, ec.PALLAS_EC_MIN, ...), so a knob documented here
cannot drift from what the code reads — pinned by
tests/test_config.py.

A few tri-state overrides (HALO_TPU_MSM_V2, HALO_TPU_NTT_V2,
HALO_TPU_WIDE_SCHEDULE, HALO_TPU_NO_NATIVE, HALO_TPU_TIMING) are
deliberately read per-call at their use site so tests can flip them after
import; `describe()` lists them for completeness.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


def _int_env(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


@dataclass(frozen=True)
class HaloConfig:
    # ---- SRS / protocol shape (compile-time in the reference) ----
    srs_max_n: int = 1 << 20          # N, group/src/consts.rs:1
    constraint_degree_multiplier: int = 8

    # ---- device dispatch thresholds (import-time; read via get_config) ----
    device_msm_min: int = field(default_factory=lambda: _int_env("HALO_TPU_DEVICE_MSM_MIN", 2048))
    device_open_min: int = field(default_factory=lambda: _int_env("HALO_TPU_DEVICE_OPEN_MIN", 4096))
    device_prover_min: int = field(default_factory=lambda: _int_env("HALO_TPU_DEVICE_PROVER_MIN", 16384))
    ntt_device_min: int = field(default_factory=lambda: _int_env("HALO_TPU_DEVICE_NTT_MIN", 8192))
    pallas_ec_min: int = field(default_factory=lambda: _int_env("HALO_TPU_PALLAS_EC_MIN", 256))
    pallas_ec: bool = field(default_factory=lambda: os.environ.get("HALO_TPU_PALLAS_EC", "1") == "1")

    # ---- kernels ----
    pallas_ff_block: int = 512        # ops/pallas_ff.py BLK

    # ---- parallelism ----
    mesh_axis: str = "data"           # 1-D mesh axis name (parallel/mesh.py)
    # IVC: prove the two curves' proofs in two threads (single-chip
    # pipelining).  Peak HBM is ~2x a single prover; set
    # HALO_TPU_IVC_SEQUENTIAL=1 on memory-constrained chips (advisor r4).
    ivc_sequential_prove: bool = field(
        default_factory=lambda: os.environ.get("HALO_TPU_IVC_SEQUENTIAL") == "1")
    # plonk/trace.py static-circuit cache entries (each pins host polys +
    # device mirrors, ~hundreds of MB at 2^16 rows)
    trace_cache_entries: int = field(
        default_factory=lambda: _int_env("HALO_TPU_TRACE_CACHE_ENTRIES", 4))

    # ---- observability ----
    timing: bool = field(default_factory=lambda: bool(os.environ.get("HALO_TPU_TIMING")))

    # env overrides read per-call at their use site (not cached here):
    PER_CALL_ENV = (
        "HALO_TPU_MSM_V2",          # ops/msm.py: force v2/v1 kernel tier
        "HALO_TPU_NTT_V2",          # ops/ntt.py: force rows-layout NTT
        "HALO_TPU_WIDE_SCHEDULE",   # ops/msm.py: force wide lane schedule
        "HALO_TPU_NO_NATIVE",       # native/: disable the C++ host tier
        "HALO_TPU_FORCE_PAIR_OPEN",  # protocol_device: pair-open gate override
        "HALO_TPU_TIMING",          # utils/timing.py: per-round timers
        "HALO_TPU_SRS_DIR",         # srs.py: reference .precompute location
        "HALO_TPU_CACHE",           # srs.py: npz/freeze cache dir
    )

    def describe(self) -> str:
        lines = ["halo_tpu configuration:"]
        for f in fields(self):
            lines.append(f"  {f.name} = {getattr(self, f.name)}")
        lines.append("  per-call env overrides: " + ", ".join(self.PER_CALL_ENV))
        return "\n".join(lines)


_CONFIG: HaloConfig | None = None


def get_config() -> HaloConfig:
    global _CONFIG
    if _CONFIG is None:
        _CONFIG = HaloConfig()
    return _CONFIG

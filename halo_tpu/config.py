"""Runtime configuration (SURVEY §5: promote scattered knobs to a config
object).

All knobs read the environment once at import; `get_config()` returns the
singleton, and `describe()` documents every knob.  Modules keep reading
their module-level constants for hot paths; this object is the single
authoritative inventory and is what tooling (bench.py, demo scripts) should
consult.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


def _int_env(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


@dataclass(frozen=True)
class HaloConfig:
    # ---- SRS / protocol shape ----
    srs_max_n: int = 1 << 20          # N, group/src/consts.rs:1
    constraint_degree_multiplier: int = 8

    # ---- device dispatch thresholds ----
    device_msm_min: int = field(default_factory=lambda: _int_env("HALO_TPU_DEVICE_MSM_MIN", 512))
    device_open_min: int = field(default_factory=lambda: _int_env("HALO_TPU_DEVICE_OPEN_MIN", 4096))
    device_prover_min: int = field(default_factory=lambda: _int_env("HALO_TPU_DEVICE_PROVER_MIN", 16384))
    ntt_device_min: int = field(default_factory=lambda: _int_env("HALO_TPU_NTT_DEVICE_MIN", 1 << 14))

    # ---- kernels ----
    msm_lanes_small: int = 128        # Pippenger lane width below 2^16
    msm_lanes_large: int = 512        # ... and at/above 2^16
    pallas_ff_block: int = 512        # ops/pallas_ff.py BLK

    # ---- parallelism ----
    mesh_axis: str = "data"           # 1-D mesh axis name (parallel/mesh.py)

    # ---- observability ----
    timing: bool = field(default_factory=lambda: bool(os.environ.get("HALO_TPU_TIMING")))

    def describe(self) -> str:
        lines = ["halo_tpu configuration:"]
        for f in fields(self):
            lines.append(f"  {f.name} = {getattr(self, f.name)}")
        return "\n".join(lines)


_CONFIG: HaloConfig | None = None


def get_config() -> HaloConfig:
    global _CONFIG
    if _CONFIG is None:
        _CONFIG = HaloConfig()
    return _CONFIG

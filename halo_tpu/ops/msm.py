"""Device-tier MSM (placeholder until the Pallas/XLA kernels land).

The production Pippenger MSM over the device mesh will live here; until
then the host tier is used and `available()` returns False.
"""

from __future__ import annotations


def available() -> bool:
    return False


def msm_srs(cfg, scalars):  # pragma: no cover - not yet implemented
    raise NotImplementedError

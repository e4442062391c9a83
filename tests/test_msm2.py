"""Differential tests for the v2 device Pippenger (halo_tpu/ops/msm2.py)
against the native C++ host MSM, in interpret mode on the CPU backend.

The default-suite test uses the small-bucket config (c=8: 32 windows of 128
buckets) so the aggregation tree stays tiny under the Pallas interpreter;
the production c=16 config is covered at n=4096 under -m slow and by the
in-run verification in bench.py on the real chip.
"""

import random

import pytest

from halo_tpu import native
from halo_tpu.curves import PALLAS, VESTA
from halo_tpu.ops import msm2
from halo_tpu.srs import load_srs


def _pts(cfg, n):
    pp = load_srs(cfg.name, 4096)
    base = pp.gs_ints(min(n, 64))
    return (base * ((n // len(base)) + 1))[:n]


@pytest.mark.parametrize("cfg", [PALLAS, VESTA], ids=["pallas", "vesta"])
def test_msm2_c8_small(cfg):
    rng = random.Random(7)
    n = 512
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    pts = _pts(cfg, n)
    got = msm2.msm2(cfg, ks, pts, c_bits=8, min_n=512)
    want = native.msm(cfg, ks, pts)
    assert got == want


def test_msm2_c8_edge_cases():
    cfg = PALLAS
    rng = random.Random(8)
    pts = _pts(cfg, 64)
    ks = [0, 1, cfg.r - 1] + [rng.randrange(cfg.r) for _ in range(61)]
    pts = [None, pts[1], pts[2]] + pts[3:64]  # infinity input
    got = msm2.msm2(cfg, ks, pts, c_bits=8, min_n=512)
    want = native.msm(cfg, ks, pts)
    assert got == want


@pytest.mark.slow
def test_msm2_c16_production_config():
    cfg = PALLAS
    rng = random.Random(9)
    n = 4096
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    pts = _pts(cfg, n)
    got = msm2.msm2(cfg, ks, pts)  # c=16, the production config
    want = native.msm(cfg, ks, pts)
    assert got == want


@pytest.mark.slow
def test_msm2_stride_and_skip_match_baseline():
    """stride>1 (S-point scan steps + masked boundary fix-ups) and the
    skip machinery must be bit-identical to the plain scan.  On-chip the
    same shapes are exercised at 2^12 by the round-5 ablation (ipa.py
    FOLD_STRIDE note)."""
    import jax
    import jax.numpy as jnp

    from halo_tpu.ops import pallas_mont as pk

    cfg = PALLAS
    rng = random.Random(11)
    n = 512
    lanes = 32  # R = 16 -> stride 4 gives 4 super-steps
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    pts = _pts(cfg, n)
    mctx = pk.mont_ctx(cfg.p, cfg.b)
    xy, inf = msm2.pack_points(cfg, pts)
    K = msm2._scalars_rows(cfg, ks, inf)
    want = native.msm(cfg, ks, pts)
    for stride in (1, 4):
        S = msm2._msm2_multi(mctx, n, lanes, 8, 0, jnp.asarray(xy),
                             jnp.asarray(K)[None], stride=stride)
        got = msm2._combine_host(cfg, jax.device_get(S), 8)
        assert got == want, f"stride={stride}"
    # skip path: upper half zeroed -> >= n/2 zero-digit lanes per window
    ks2 = ks[: n // 2] + [0] * (n // 2)
    K2 = msm2._scalars_rows(cfg, ks2, inf)
    want2 = native.msm(cfg, ks2, pts)
    for stride in (1, 4):
        S = msm2._msm2_multi(mctx, n, lanes, 8, n // 2, jnp.asarray(xy),
                             jnp.asarray(K2)[None], stride=stride)
        got2 = msm2._combine_host(cfg, jax.device_get(S), 8)
        assert got2 == want2, f"skip stride={stride}"

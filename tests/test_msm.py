"""Device MSM (naive + Pippenger) vs host Pippenger ground truth."""

import random

import jax.numpy as jnp
import pytest

from halo_tpu import curves as hc
from halo_tpu.ops import ec, ff, msm

rng = random.Random(31)


def _points_scalars(cfg, n):
    pts = [hc.ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r)) for _ in range(n)]
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    return pts, ks


def test_msm_naive_matches_host():
    cfg = hc.PALLAS
    ctx = ec.ec_ctx(cfg)
    pts, ks = _points_scalars(cfg, 16)
    ks[0] = 0  # digit-0 edge
    P = ec.from_affine_ints(ctx, pts)
    K = jnp.asarray(ff.ints_to_array(ks))
    total = msm.msm_naive_jit(ctx, P, K)
    got = ec.to_affine_ints(ctx, tuple(c[None] for c in total))[0]
    assert got == hc.msm_host(cfg, ks, pts)


def test_scan_sum_matches_tree():
    cfg = hc.VESTA
    ctx = ec.ec_ctx(cfg)
    pts, _ = _points_scalars(cfg, 13)
    P = ec.from_affine_ints(ctx, pts)
    total = msm.scan_sum(ctx, P)
    got = ec.to_affine_ints(ctx, tuple(c[None] for c in total))[0]
    expected = None
    for p in pts:
        expected = hc.ec_add(cfg, expected, p)
    assert got == expected


@pytest.mark.slow
def test_pippenger_matches_host():
    cfg = hc.PALLAS
    ctx = ec.ec_ctx(cfg)
    n = 8192
    pts, ks = _points_scalars(cfg, 64)
    # tile to n to keep host-side generation cheap; scalars vary
    pts = (pts * (n // 64))[:n]
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    ks[0] = 0
    ks[1] = cfg.r - 1
    P = ec.from_affine_ints(ctx, pts)
    K = jnp.asarray(ff.ints_to_array(ks))
    total = msm.pippenger_jit(ctx, P, K, 128)
    got = ec.to_affine_ints(ctx, tuple(c[None] for c in total))[0]
    assert got == hc.msm_host(cfg, ks, pts)


def test_msm_srs_small_vs_host():
    from halo_tpu.srs import load_srs

    cfg = hc.PALLAS
    n = 64
    pp = load_srs("pallas", 1 << 10)
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    got = msm.msm_srs(cfg, ks)
    assert got == hc.msm_host(cfg, ks, pp.gs_ints(n))

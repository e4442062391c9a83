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


def _pippenger_case(cfg, pts, ks, lanes):
    ctx = ec.ec_ctx(cfg)
    P = ec.from_affine_ints(ctx, pts)
    K = jnp.asarray(ff.ints_to_array(ks))
    total = msm.pippenger_jit(ctx, P, K, lanes, msm._wide_schedule())
    got = ec.to_affine_ints(ctx, tuple(c[None] for c in total))[0]
    assert got == hc.msm_host(cfg, ks, pts)


def test_pippenger_default_and_adversarial_digits():
    """The production bucket-accumulation path (sort + run-detection +
    cross-chunk merge, ops/msm.py:81-155) under the DEFAULT suite, with
    adversarial digit patterns: all-zero scalars, all-equal digits
    (maximal runs crossing every chunk boundary), duplicate points,
    infinities, and r-1.  n=4096 / lanes=128 exercises multi-chunk merge.

    One jit compile is shared by all cases (same shapes)."""
    cfg = hc.PALLAS
    n = 4096
    lanes = 128
    base_pts, _ = _points_scalars(cfg, 32)
    pts = (base_pts * (n // 32))[:n]  # duplicate points in the same buckets

    # case 1: random + structured edges
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    ks[0] = 0
    ks[1] = cfg.r - 1
    ks[2] = 1
    _pippenger_case(cfg, pts, ks, lanes)

    # case 2: all-equal scalars -> every window has one giant run spanning
    # all chunks; plus a block of zeros (digit-0 dominating)
    k = rng.randrange(cfg.r)
    ks = [k] * n
    ks[: n // 4] = [0] * (n // 4)
    _pippenger_case(cfg, pts, ks, lanes)

    # case 3: infinities mixed in + tiny digit diversity (runs end exactly
    # at lane-chunk boundaries: scalars constant per 128-lane chunk)
    pts3 = list(pts)
    for i in range(0, n, 7):
        pts3[i] = None
    ks = [(i // lanes) % 3 for i in range(n)]
    _pippenger_case(cfg, pts3, ks, lanes)


@pytest.mark.slow
def test_pippenger_wide_schedule_matches(monkeypatch):
    """The ACCELERATOR reduction schedule (log-depth tree window sums +
    segmented associative-scan merge, ops/msm.py:_wide_schedule) forced on
    the CPU mesh, vs the host MSM.  Slow: the extra graph-shape
    instantiations take XLA CPU minutes to compile."""
    monkeypatch.setenv("HALO_TPU_WIDE_SCHEDULE", "1")
    cfg = hc.PALLAS
    # n shrunk 4096 -> 1024 with lanes 64 (same chunk structure, 16 chunks;
    # the round-3 size blew the CI time-box purely on XLA CPU compiles of
    # the v1 jnp graphs — v2 is the production tier, this pins the v1
    # schedule's segmented-scan logic, which is size-independent)
    n = 1024
    base_pts, _ = _points_scalars(cfg, 32)
    pts = (base_pts * (n // 32))[:n]
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    ks[0] = 0
    ks[1] = cfg.r - 1
    k = rng.randrange(cfg.r)
    ks[2 : n // 4] = [k] * (n // 4 - 2)  # giant run crossing chunks
    _pippenger_case(cfg, pts, ks, 64)


@pytest.mark.slow
def test_pippenger_large_matches_host():
    cfg = hc.PALLAS
    ctx = ec.ec_ctx(cfg)
    n = 2048  # shrunk from 8192: see test_pippenger_wide_schedule_matches
    pts, ks = _points_scalars(cfg, 64)
    # tile to n to keep host-side generation cheap; scalars vary
    pts = (pts * (n // 64))[:n]
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    ks[0] = 0
    ks[1] = cfg.r - 1
    P = ec.from_affine_ints(ctx, pts)
    K = jnp.asarray(ff.ints_to_array(ks))
    total = msm.pippenger_jit(ctx, P, K, 64, msm._wide_schedule())
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

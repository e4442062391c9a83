"""Device-tier EC ops vs host Jacobian ground truth."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo_tpu import curves as hc
from halo_tpu.ops import ec, ff

rng = random.Random(11)


def rand_points(cfg, n):
    return [hc.ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r)) for _ in range(n)]


@pytest.mark.parametrize("cfg", [hc.PALLAS, hc.VESTA], ids=["pallas", "vesta"])
def test_affine_roundtrip(cfg):
    ctx = ec.ec_ctx(cfg)
    pts = rand_points(cfg, 4) + [None]
    P = ec.from_affine_ints(ctx, pts)
    assert ec.to_affine_ints(ctx, P) == pts


def test_add_matches_host():
    cfg = hc.PALLAS
    ctx = ec.ec_ctx(cfg)
    a = rand_points(cfg, 8)
    b = rand_points(cfg, 8)
    # include edge cases: P + inf, inf + P, P + P, P + (-P)
    a += [a[0], None, a[1], a[2]]
    b += [None, b[0], a[1], hc.ec_neg(cfg, a[2])]
    got = ec.to_affine_ints(ctx, ec.add_jit(ctx, ec.from_affine_ints(ctx, a), ec.from_affine_ints(ctx, b)))
    expected = [hc.ec_add(cfg, x, y) for x, y in zip(a, b)]
    assert got == expected


def test_double_matches_host():
    cfg = hc.VESTA
    ctx = ec.ec_ctx(cfg)
    pts = rand_points(cfg, 6) + [None]
    got = ec.to_affine_ints(ctx, ec.double_jit(ctx, ec.from_affine_ints(ctx, pts)))
    expected = [hc.ec_add(cfg, p, p) for p in pts]
    assert got == expected


def test_scalar_mul_matches_host():
    cfg = hc.PALLAS
    ctx = ec.ec_ctx(cfg)
    pts = rand_points(cfg, 4)
    ks = [rng.randrange(cfg.r) for _ in range(3)] + [0]
    P = ec.from_affine_ints(ctx, pts)
    K = jnp.asarray(ff.ints_to_array(ks))
    got = ec.to_affine_ints(ctx, ec.scalar_mul_jit(ctx, P, K))
    expected = [hc.ec_mul(cfg, p, k) for p, k in zip(pts, ks)]
    assert got == expected


def test_tree_reduce_matches_host():
    cfg = hc.PALLAS
    ctx = ec.ec_ctx(cfg)
    pts = rand_points(cfg, 11)  # non-power-of-two
    P = ec.from_affine_ints(ctx, pts)
    total = ec.tree_reduce(ctx, P)
    got = ec.to_affine_ints(ctx, tuple(c[None] for c in total))[0]
    expected = None
    for p in pts:
        expected = hc.ec_add(cfg, expected, p)
    assert got == expected


def test_srs_points_load_to_device():
    from halo_tpu.srs import load_srs

    cfg = hc.PALLAS
    ctx = ec.ec_ctx(cfg)
    pp = load_srs("pallas", 1 << 10)
    P = ec.from_limbs_canonical(ctx, pp.gs_x[:8], pp.gs_y[:8])
    assert ec.to_affine_ints(ctx, P) == pp.gs_ints(8)

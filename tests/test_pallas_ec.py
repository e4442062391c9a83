"""Differential tests: fused Pallas EC add/double kernels vs jnp vs host.

On the CPU CI backend the kernels run in Pallas interpreter mode; on TPU
they compile to real Mosaic kernels.  Both must agree bit-for-bit with the
jnp complete formulas (ops/ec.py) and the exact host Jacobian arithmetic
(curves.py), including the complete-formula edge cases (P+inf, inf+P, P+P,
P+(-P)).
"""

import random

import numpy as np
import pytest

import halo_tpu.curves as hc
from halo_tpu.ops import ec
from halo_tpu.ops.pallas_ec import ec_add_pallas, ec_double_pallas

rng = random.Random(7)


def rand_points(cfg, n):
    return [hc.ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r)) for _ in range(n)]


@pytest.mark.parametrize("cfg", [hc.PALLAS, hc.VESTA], ids=["pallas", "vesta"])
def test_pallas_ec_add_matches_host(cfg):
    ctx = ec.ec_ctx(cfg)
    a = rand_points(cfg, 8)
    b = rand_points(cfg, 8)
    # complete-formula edge cases
    a += [a[0], None, a[1], a[2], None]
    b += [None, b[0], a[1], hc.ec_neg(cfg, a[2]), None]
    P = ec.from_affine_ints(ctx, a)
    Q = ec.from_affine_ints(ctx, b)
    got = ec.to_affine_ints(ctx, ec_add_pallas(ctx, P, Q))
    expected = [hc.ec_add(cfg, x, y) for x, y in zip(a, b)]
    assert got == expected


def test_pallas_ec_double_matches_host():
    cfg = hc.VESTA
    ctx = ec.ec_ctx(cfg)
    pts = rand_points(cfg, 6) + [None]
    got = ec.to_affine_ints(ctx, ec_double_pallas(ctx, ec.from_affine_ints(ctx, pts)))
    expected = [hc.ec_add(cfg, p, p) for p in pts]
    assert got == expected


def test_pallas_ec_add_matches_jnp_batched():
    """Multi-dim batch + padding path vs the jnp formulas, bit-for-bit."""
    cfg = hc.PALLAS
    ctx = ec.ec_ctx(cfg)
    pts_a = rand_points(cfg, 6)
    pts_b = rand_points(cfg, 6)
    P = tuple(c.reshape(2, 3, 16) for c in ec.from_affine_ints(ctx, pts_a))
    Q = tuple(c.reshape(2, 3, 16) for c in ec.from_affine_ints(ctx, pts_b))
    got = ec_add_pallas(ctx, P, Q)
    want = ec.add(ctx, P, Q)
    for g, w in zip(got, want):
        assert g.shape == (2, 3, 16)
        assert np.array_equal(np.asarray(g), np.asarray(w))

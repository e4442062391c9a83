"""PCDL protocol round-trips (mirrors reference pcdl.rs test strategy)."""

import random

import pytest

from halo_tpu import pcdl
from halo_tpu.curves import PALLAS, VESTA

rng = random.Random(42)


@pytest.mark.parametrize("cfg", [PALLAS, VESTA], ids=["pallas", "vesta"])
def test_open_check_roundtrip(cfg):
    n = 2 ** rng.randrange(2, 7)
    d = n - 1
    p = [rng.randrange(cfg.r) for _ in range(n)]
    z = rng.randrange(cfg.r)
    inst = pcdl.Instance.open(cfg, p, d, z, w=None)
    pcdl.check(cfg, inst.C, inst.d, inst.z, inst.v, inst.pi)


def test_open_check_roundtrip_hiding():
    cfg = PALLAS
    n = 16
    p = [rng.randrange(cfg.r) for _ in range(n)]
    z = rng.randrange(cfg.r)
    inst = pcdl.Instance.open(cfg, p, n - 1, z, w=rng.randrange(cfg.r), rng=rng)
    assert inst.pi.C_bar is not None and inst.pi.w_prime is not None
    pcdl.check(cfg, inst.C, inst.d, inst.z, inst.v, inst.pi)


def test_low_degree_poly():
    # degree d' < d (reference test_check_no_hiding samples d' < d)
    cfg = PALLAS
    n = 32
    d_prime = rng.randrange(1, n - 1)
    p = [rng.randrange(cfg.r) for _ in range(d_prime + 1)]
    z = rng.randrange(cfg.r)
    inst = pcdl.Instance.open(cfg, p, n - 1, z, w=None)
    pcdl.check(cfg, inst.C, inst.d, inst.z, inst.v, inst.pi)


def test_zero_instance():
    # reference Instance::zero: zero poly, C = identity, z = v = 0
    cfg = PALLAS
    n = 8
    inst = pcdl.Instance(
        C=None,
        d=n - 1,
        z=0,
        v=0,
        pi=pcdl.open_without_eval(cfg, [0], None, n - 1, 0, 0, None),
    )
    pcdl.check(cfg, inst.C, inst.d, inst.z, inst.v, inst.pi)
    assert inst.pi.c == 0
    assert all(L is None for L in inst.pi.Ls)


def test_wrong_eval_rejected():
    cfg = PALLAS
    n = 16
    p = [rng.randrange(cfg.r) for _ in range(n)]
    z = rng.randrange(cfg.r)
    inst = pcdl.Instance.open(cfg, p, n - 1, z, w=None)
    with pytest.raises(ValueError):
        pcdl.succinct_check(cfg, inst.C, inst.d, inst.z, (inst.v + 1) % cfg.r, inst.pi)


def test_hpoly_eval_matches_coeffs():
    cfg = PALLAS
    lg_n = 5
    xis = [rng.randrange(cfg.r) for _ in range(lg_n + 1)]
    h = pcdl.HPoly(xis=xis, r=cfg.r)
    z = rng.randrange(cfg.r)
    assert h.eval(z) == pcdl.poly_eval(cfg, h.coeffs(), z)


def test_hpoly_coeff_structure():
    # coeff of X^j = prod over set bits i of j of xi_{lg_n - i}
    # (reference pcdl.rs test_construct_h_with_degree_7)
    cfg = PALLAS
    xis = [rng.randrange(cfg.r) for _ in range(4)]
    h = pcdl.HPoly(xis=xis, r=cfg.r)
    cs = h.coeffs()
    assert cs[0] == 1
    assert cs[1] == xis[3]
    assert cs[2] == xis[2]
    assert cs[3] == xis[2] * xis[3] % cfg.r
    assert cs[4] == xis[1]
    assert cs[7] == xis[1] * xis[2] % cfg.r * xis[3] % cfg.r


def test_succinct_check_u_fold_identity():
    # U returned by succinct_check equals commit to h coefficients
    cfg = PALLAS
    n = 32
    p = [rng.randrange(cfg.r) for _ in range(n)]
    z = rng.randrange(cfg.r)
    inst = pcdl.Instance.open(cfg, p, n - 1, z, w=None)
    h, U = pcdl.succinct_check(cfg, inst.C, inst.d, inst.z, inst.v, inst.pi)
    assert pcdl.commit(cfg, h.coeffs(), n - 1) == U

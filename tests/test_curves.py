"""Host-tier curve + SRS tests (reference parity: crates/group)."""

import random

import pytest

from halo_tpu.curves import (
    PALLAS,
    VESTA,
    batch_normalize,
    ec_add,
    ec_mul,
    ec_neg,
    from_jac,
    jac_add,
    jac_mul,
    msm_host,
    to_jac,
)
from halo_tpu.fields import FP_MOD, FQ_MOD

rng = random.Random(1234)


def test_generator_on_curve():
    for cfg in (PALLAS, VESTA):
        assert cfg.is_on_curve(cfg.generator)


def test_group_laws():
    for cfg in (PALLAS, VESTA):
        g = cfg.generator
        a = ec_mul(cfg, g, rng.randrange(cfg.r))
        b = ec_mul(cfg, g, rng.randrange(cfg.r))
        c = ec_mul(cfg, g, rng.randrange(cfg.r))
        assert ec_add(cfg, a, b) == ec_add(cfg, b, a)
        assert ec_add(cfg, ec_add(cfg, a, b), c) == ec_add(cfg, a, ec_add(cfg, b, c))
        assert ec_add(cfg, a, None) == a
        assert ec_add(cfg, a, ec_neg(cfg, a)) is None
        # doubling consistency
        assert ec_add(cfg, a, a) == ec_mul(cfg, a, 2)


def test_scalar_mul_order():
    for cfg in (PALLAS, VESTA):
        assert ec_mul(cfg, cfg.generator, cfg.r) is None
        assert ec_mul(cfg, cfg.generator, 1) == cfg.generator


def test_scalar_field_moduli_match_curve_order():
    # r*G = O and (r-1)*G = -G pin down the group order
    for cfg in (PALLAS, VESTA):
        g = cfg.generator
        assert ec_mul(cfg, g, cfg.r - 1) == ec_neg(cfg, g)


def test_msm_host_matches_naive():
    cfg = PALLAS
    n = 32
    pts = [ec_mul(cfg, cfg.generator, rng.randrange(cfg.r)) for _ in range(n)]
    scalars = [rng.randrange(cfg.r) for _ in range(n)]
    expected = None
    for s, p in zip(scalars, pts):
        expected = ec_add(cfg, expected, ec_mul(cfg, p, s))
    assert msm_host(cfg, scalars, pts) == expected


def test_batch_normalize():
    cfg = VESTA
    jacs = [jac_mul(cfg, to_jac(cfg.generator), rng.randrange(cfg.r)) for _ in range(10)]
    jacs.append((1, 1, 0))  # infinity
    out = batch_normalize(cfg, jacs)
    assert out[-1] is None
    for j, a in zip(jacs, out):
        assert from_jac(cfg, j) == a


class TestSRS:
    @pytest.fixture(scope="class")
    def pp(self):
        from halo_tpu.srs import load_srs

        return load_srs("pallas", 1 << 10)

    def test_sh_on_curve(self, pp):
        assert PALLAS.is_on_curve(pp.S)
        assert PALLAS.is_on_curve(pp.H)

    def test_gs_on_curve_sampled(self, pp):
        for i in rng.sample(range(len(pp)), 32):
            assert PALLAS.is_on_curve(pp.g_affine(i))

    def test_sh_matches_generation_formula(self, pp):
        # S = G*sha3(le64(0) || genesis), H = index 1
        # (reference crates/group/src/main.rs:55-68)
        import hashlib

        genesis = b"To understand recursion, one must first understand recursion"
        for idx, expected in ((0, pp.S), (1, pp.H)):
            h = hashlib.sha3_256(idx.to_bytes(8, "little") + genesis).digest()
            scalar = int.from_bytes(h, "little") % PALLAS.r
            assert ec_mul(PALLAS, PALLAS.generator, scalar) == expected

    def test_first_g_matches_generation_formula(self, pp):
        import hashlib

        genesis = b"To understand recursion, one must first understand recursion"
        # block 0 starts at hash index 2 (reference main.rs:115)
        h = hashlib.sha3_256((2).to_bytes(8, "little") + genesis).digest()
        scalar = int.from_bytes(h, "little") % PALLAS.r
        assert ec_mul(PALLAS, PALLAS.generator, scalar) == pp.g_affine(0)

"""Differential tests: C++ native tier vs the pure-Python host tier.

The native library (halo_tpu/native/pasta_native.cpp) is an optional
accelerator — every call site keeps a Python fallback — so these tests
skip when the toolchain is unavailable rather than fail.
"""

import random

import pytest

from halo_tpu import native
from halo_tpu.curves import PALLAS, VESTA, ec_add, ec_mul, msm_host
from halo_tpu.fields import FP_MOD, FQ_MOD, two_adic_root_of_unity

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_field_batch_ops():
    rng = random.Random(1)
    for m in (FP_MOD, FQ_MOD):
        a = [rng.randrange(m) for _ in range(65)]
        b = [rng.randrange(m) for _ in range(65)]
        s = rng.randrange(m)
        assert native.batch_mul(m, a, b) == [x * y % m for x, y in zip(a, b)]
        assert native.batch_add(m, a, b) == [(x + y) % m for x, y in zip(a, b)]
        assert native.batch_sub(m, a, b) == [(x - y) % m for x, y in zip(a, b)]
        assert native.batch_axpy(m, a, b, s) == [(x + s * y) % m for x, y in zip(a, b)]
        assert native.scalar_dot(m, a, b) == sum(x * y for x, y in zip(a, b)) % m
        invs = native.batch_inv(m, a)
        assert all(x * i % m == 1 for x, i in zip(a, invs))
    # batch_inv maps 0 -> 0 (Montgomery-trick skip)
    assert native.batch_inv(FP_MOD, [0, 2])[0] == 0


def test_field_edge_values():
    for m in (FP_MOD, FQ_MOD):
        edge = [0, 1, m - 1, m - 2, 2]
        got = native.batch_mul(m, edge, edge)
        assert got == [x * x % m for x in edge]
        assert native.batch_add(m, edge, [m - 1] * 5) == [(x + m - 1) % m for x in edge]


def test_ntt_roundtrip_and_parity():
    import halo_tpu.hostpoly as hp

    rng = random.Random(2)
    for m in (FP_MOD, FQ_MOD):
        for log_n in (3, 8):
            n = 1 << log_n
            vec = [rng.randrange(m) for _ in range(n)]
            w = two_adic_root_of_unity(m, log_n)
            fwd = native.ntt(m, vec, w, False)
            # python reference path (bypass native/device routing)
            a = list(vec)
            roots = hp._roots(m, log_n, False)
            exp = [sum(c * pow(roots[1], i * j, m) for j, c in enumerate(a)) % m for i in range(n)] if n <= 8 else None
            if exp is not None:
                assert fwd == exp
            assert native.ntt(m, fwd, w, True) == vec


def test_ec_batch_mul_and_msm():
    rng = random.Random(3)
    for cfg in (PALLAS, VESTA):
        pts = [ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r)) for _ in range(33)]
        pts.append(None)
        ks = [rng.randrange(cfg.r) for _ in range(34)]
        ks[5] = 0
        got = native.ec_batch_mul(cfg, ks, pts)
        exp = [ec_mul(cfg, p, k) if p is not None else None for p, k in zip(pts, ks)]
        assert got == exp
        assert native.msm(cfg, ks, pts) == msm_host(cfg, ks, pts)


def test_ec_fold():
    rng = random.Random(4)
    cfg = PALLAS
    ps = [ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r)) for _ in range(16)]
    qs = [ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r)) for _ in range(16)]
    ps[3] = None
    qs[7] = None
    s = rng.randrange(cfg.r)
    got = native.ec_fold(cfg, ps, qs, s)
    exp = [ec_add(cfg, p, ec_mul(cfg, q, s) if q else None) for p, q in zip(ps, qs)]
    assert got == exp


def test_poseidon_permute_parity():
    from halo_tpu.poseidon.sponge import _params_for_modulus

    rng = random.Random(5)
    for m in (FP_MOD, FQ_MOD):
        mds, rcs = _params_for_modulus(m)
        st = [rng.randrange(m) for _ in range(3)]
        got = native.poseidon_permute(m, st)
        # inline python reference (sponge.permute itself routes to native)
        s = list(st)
        for r in range(55):
            sb = [pow(x, 7, m) for x in s]
            s = [
                (mds[i][0] * sb[0] + mds[i][1] * sb[1] + mds[i][2] * sb[2] + rcs[r][i]) % m
                for i in range(3)
            ]
        assert got == s
        batch = [[rng.randrange(m) for _ in range(3)] for _ in range(4)]
        outs = native.poseidon_permute_batch(m, batch)
        assert outs[0] != batch[0] and len(outs) == 4


def test_pcdl_open_native_matches_python(monkeypatch):
    """The native-accelerated host IPA fold emits byte-identical proofs."""
    import halo_tpu.pcdl as pcdl

    rng = random.Random(6)
    cfg = PALLAS
    n = 64
    p = [rng.randrange(cfg.r) for _ in range(n)]
    z = rng.randrange(cfg.r)
    C = pcdl.commit(cfg, p, n - 1)
    pi_native = pcdl.open_proof(cfg, p, C, n - 1, z)

    monkeypatch.setenv("HALO_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_err", "forced off")
    try:
        pi_py = pcdl.open_proof(cfg, p, C, n - 1, z)
    finally:
        monkeypatch.setattr(native, "_lib_err", None)
    assert pi_native == pi_py

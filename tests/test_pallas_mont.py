"""Differential tests for the v2 lazy-domain Montgomery/EC Pallas kernels
(halo_tpu/ops/pallas_mont.py) in interpret mode on the CPU backend.

Reference semantics being pinned: arkworks field mul / Projective add
(crates/group/src/group.rs:48-56) -- checked against exact Python integer
arithmetic, including the complete-formula edge cases (identity operands,
P + P, P + (-P)).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from halo_tpu.curves import PALLAS, VESTA
from halo_tpu.ops import pallas_mont as pm
from halo_tpu.ops.ff import NLIMBS, array_to_ints, ints_to_array

R256 = 1 << 256
N = 512  # one BLK


def _to_rows(vals):
    return jnp.asarray(ints_to_array(vals).T.copy())


def _from_rows(a):
    return array_to_ints(np.asarray(a).T.copy())


def _py_add(p, P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    (x1, y1), (x2, y2) = P, Q
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P == Q:
        lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return (x3, (lam * (x1 - x3) - y1) % p)


def _gen_points(cfg, count):
    G = (cfg.p - 1, 2)  # on y^2 = x^3 + 5 for both Pasta curves
    pts = [G]
    for _ in range(count - 1):
        pts.append(_py_add(cfg.p, pts[-1], G))
    return pts


def _pt_rows(cfg, pts):
    p = cfg.p
    X = [((pt[0] * R256) % p if pt else 0) for pt in pts]
    Y = [((pt[1] * R256) % p if pt else R256 % p) for pt in pts]
    Z = [(R256 % p if pt else 0) for pt in pts]
    pad = N - len(pts)
    X += [0] * pad
    Y += [R256 % p] * pad
    Z += [0] * pad
    return (_to_rows(X), _to_rows(Y), _to_rows(Z))


def _rows_to_aff(cfg, T, count):
    p = cfg.p
    X = _from_rows(T[0])[:count]
    Y = _from_rows(T[1])[:count]
    Z = _from_rows(T[2])[:count]
    out = []
    for x, y, z in zip(X, Y, Z):
        x, y, z = x % p, y % p, z % p
        if z == 0:
            out.append(None)
            continue
        zi = pow(z, -1, p)
        out.append((x * zi % p, y * zi % p))
    return out


@pytest.mark.parametrize("cfg", [PALLAS, VESTA], ids=["pallas", "vesta"])
def test_mm_rows_quasi_domain(cfg):
    p = cfg.p
    ctx = pm.mont_ctx(p, cfg.b)
    rng = np.random.default_rng(42)
    # random quasi-2p inputs, including values in [p, 2p)
    a = [int.from_bytes(rng.bytes(32), "little") % (2 * p) for _ in range(N)]
    b = [int.from_bytes(rng.bytes(32), "little") % (2 * p) for _ in range(N)]
    got = _from_rows(pm.mm_rows(ctx, _to_rows(a), _to_rows(b)))
    rinv = pow(R256, -1, p)
    for g, ai, bi in zip(got, a, b):
        assert g % p == ai * bi * rinv % p
        assert g < 2 * p + (1 << 140)  # stays inside the quasi-2p domain


def test_padd_rows_complete():
    cfg = PALLAS
    pts = _gen_points(cfg, 40)
    p = cfg.p
    ctx = pm.mont_ctx(p, cfg.b)
    a = pts[:20] + [pts[0], pts[1], pts[2], None, None]
    b = pts[20:40] + [pts[0], (pts[1][0], p - pts[1][1]), None, pts[3], None]
    got = _rows_to_aff(cfg, pm.padd_rows(ctx, _pt_rows(cfg, a), _pt_rows(cfg, b)), len(a))
    want = [_py_add(p, x, y) for x, y in zip(a, b)]
    assert got == want


def test_pmadd_and_pack_and_pdbl():
    cfg = PALLAS
    p = cfg.p
    ctx = pm.mont_ctx(p, cfg.b)
    pts = _gen_points(cfg, 8)
    proj = [pts[0], None, pts[3], pts[4], pts[4]]
    aff = [pts[1], pts[2], pts[3], (pts[4][0], p - pts[4][1]), pts[5]]
    A = _pt_rows(cfg, proj)
    ax = _to_rows([(x * R256) % p for x, _ in aff] + [(pts[0][0] * R256) % p] * (N - len(aff)))
    ay = _to_rows([(y * R256) % p for _, y in aff] + [(pts[0][1] * R256) % p] * (N - len(aff)))
    got = _rows_to_aff(cfg, pm.pmadd_rows(ctx, A, (ax, ay)), len(proj))
    want = [_py_add(p, x, y) for x, y in zip(proj, aff)]
    assert got == want

    # packed + signed variant (the MSM scan body)
    pack = ax | (ay << 16)
    signs = [0, 0, 0, 0, 1]
    sgn = jnp.asarray(np.array(signs + [0] * (N - len(signs)), np.uint32)[None, :])
    got2 = _rows_to_aff(cfg, pm.pmadd_pack_rows(ctx, A, pack, sgn), len(proj))
    want2 = [_py_add(p, x, (y[0], p - y[1]) if s else y)
             for x, y, s in zip(proj, aff, signs)]
    assert got2 == want2

    dbl_in = [pts[0], None, pts[6]]
    got3 = _rows_to_aff(cfg, pm.pdbl_rows(ctx, _pt_rows(cfg, dbl_in)), len(dbl_in))
    assert got3 == [_py_add(p, x, x) for x in dbl_in]


def test_jnp_fallback_tier_matches(monkeypatch):
    """HALO_TPU_ROWS_JNP=1: the jnp fallback tier (used by CPU-mesh
    dryruns, where interpret-mode compiles cost minutes) must produce the
    same group elements / field residues as the kernels.  Field values are
    compared mod p (fallback keeps canonical representatives; the kernels
    the quasi-2p domain), points as affine."""
    monkeypatch.setenv("HALO_TPU_ROWS_JNP", "1")
    assert pm.rows_jnp_enabled()
    cfg = PALLAS
    p = cfg.p
    ctx = pm.mont_ctx(p, cfg.b)
    rng = np.random.default_rng(43)
    a = [int.from_bytes(rng.bytes(32), "little") % p for _ in range(N)]
    b = [int.from_bytes(rng.bytes(32), "little") % p for _ in range(N)]
    got = _from_rows(pm.canon_rows(ctx, pm.mm_rows(ctx, _to_rows(a), _to_rows(b))))
    rinv = pow(R256, -1, p)
    assert [g % p for g in got] == [ai * bi * rinv % p for ai, bi in zip(a, b)]

    pts = _gen_points(cfg, 8)
    proj = [pts[0], None, pts[3], pts[4], pts[4]]
    aff = [pts[1], pts[2], pts[3], (pts[4][0], p - pts[4][1]), pts[5]]
    A = _pt_rows(cfg, proj)
    ax = _to_rows([(x * R256) % p for x, _ in aff] + [(pts[0][0] * R256) % p] * (N - len(aff)))
    ay = _to_rows([(y * R256) % p for _, y in aff] + [(pts[0][1] * R256) % p] * (N - len(aff)))
    pack = ax | (ay << 16)
    signs = [0, 0, 0, 0, 1]
    sgn = jnp.asarray(np.array(signs + [0] * (N - len(signs)), np.uint32)[None, :])
    got2 = _rows_to_aff(cfg, pm.pmadd_pack_rows(ctx, A, pack, sgn), len(proj))
    want2 = [_py_add(p, x, (y[0], p - y[1]) if s else y)
             for x, y, s in zip(proj, aff, signs)]
    assert got2 == want2

    got3 = _rows_to_aff(cfg, pm.pdbl_rows(ctx, _pt_rows(cfg, proj)), len(proj))
    assert got3 == [_py_add(p, x, x) for x in proj]
    got4 = _rows_to_aff(
        cfg, pm.padd_rows(ctx, _pt_rows(cfg, proj), _pt_rows(cfg, [pts[5], pts[6], None, pts[4], (pts[4][0], p - pts[4][1])])), len(proj))
    want4 = [_py_add(p, x, y) for x, y in zip(proj, [pts[5], pts[6], None, pts[4], (pts[4][0], p - pts[4][1])])]
    assert got4 == want4

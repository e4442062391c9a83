"""Host-tier Pasta curve arithmetic (exact, python-int based).

The Pasta cycle (reference: crates/group/src/wrappers.rs:431-588):
  Pallas: y^2 = x^3 + 5 over Fq, scalar field Fp, generator (-1, 2)
  Vesta:  y^2 = x^3 + 5 over Fp, scalar field Fq, generator (-1, 2)

Affine points are (x, y) int tuples; None is the point at infinity.  Internal
hot paths use Jacobian coordinates.  The device tier (halo_tpu/ops/ec.py)
uses batched complete projective formulas instead; both are cross-checked.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

from .fields import FP_MOD, FQ_MOD, inv, sqrt

Affine = Optional[Tuple[int, int]]  # None = point at infinity


@dataclass(frozen=True)
class CurveCfg:
    name: str
    p: int  # base field modulus
    r: int  # scalar field modulus
    b: int = 5

    @property
    def generator(self) -> Affine:
        return (self.p - 1, 2)

    def is_on_curve(self, pt: Affine) -> bool:
        if pt is None:
            return True
        x, y = pt
        return (y * y - (x * x * x + self.b)) % self.p == 0

    @property
    def other(self) -> "CurveCfg":
        return VESTA if self is PALLAS else PALLAS


PALLAS = CurveCfg(name="pallas", p=FQ_MOD, r=FP_MOD)
VESTA = CurveCfg(name="vesta", p=FP_MOD, r=FQ_MOD)


# ---------------- Jacobian arithmetic (X/Z^2, Y/Z^3) ---------------- #

Jac = Tuple[int, int, int]  # Z == 0 => infinity

JAC_INF: Jac = (1, 1, 0)


def to_jac(pt: Affine) -> Jac:
    if pt is None:
        return JAC_INF
    return (pt[0], pt[1], 1)


def from_jac(cfg: CurveCfg, P: Jac) -> Affine:
    X, Y, Z = P
    if Z == 0:
        return None
    p = cfg.p
    zinv = inv(Z, p)
    zinv2 = zinv * zinv % p
    return (X * zinv2 % p, Y * zinv2 % p * zinv % p)


def jac_double(cfg: CurveCfg, P: Jac) -> Jac:
    X1, Y1, Z1 = P
    if Z1 == 0 or Y1 == 0:
        return JAC_INF if Y1 == 0 and Z1 != 0 else P
    p = cfg.p
    A = X1 * X1 % p
    B = Y1 * Y1 % p
    C = B * B % p
    D = 2 * ((X1 + B) * (X1 + B) - A - C) % p
    E = 3 * A % p
    F = E * E % p
    X3 = (F - 2 * D) % p
    Y3 = (E * (D - X3) - 8 * C) % p
    Z3 = 2 * Y1 * Z1 % p
    return (X3, Y3, Z3)


def jac_add(cfg: CurveCfg, P: Jac, Q: Jac) -> Jac:
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    if Z1 == 0:
        return Q
    if Z2 == 0:
        return P
    p = cfg.p
    Z1Z1 = Z1 * Z1 % p
    Z2Z2 = Z2 * Z2 % p
    U1 = X1 * Z2Z2 % p
    U2 = X2 * Z1Z1 % p
    S1 = Y1 * Z2 * Z2Z2 % p
    S2 = Y2 * Z1 * Z1Z1 % p
    if U1 == U2:
        if S1 != S2:
            return JAC_INF
        return jac_double(cfg, P)
    H = (U2 - U1) % p
    I = 4 * H * H % p
    J = H * I % p
    rr = 2 * (S2 - S1) % p
    V = U1 * I % p
    X3 = (rr * rr - J - 2 * V) % p
    Y3 = (rr * (V - X3) - 2 * S1 * J) % p
    Z3 = (Z1 + Z2) % p
    Z3 = (Z3 * Z3 - Z1Z1 - Z2Z2) % p * H % p
    return (X3, Y3, Z3)


def jac_neg(cfg: CurveCfg, P: Jac) -> Jac:
    X, Y, Z = P
    return (X, (-Y) % cfg.p, Z)


# ---------------- Affine-level API ---------------- #


def ec_add(cfg: CurveCfg, a: Affine, b: Affine) -> Affine:
    return from_jac(cfg, jac_add(cfg, to_jac(a), to_jac(b)))


def ec_neg(cfg: CurveCfg, a: Affine) -> Affine:
    if a is None:
        return None
    return (a[0], (-a[1]) % cfg.p)


def ec_mul(cfg: CurveCfg, a: Affine, k: int) -> Affine:
    return from_jac(cfg, jac_mul(cfg, to_jac(a), k))


def jac_mul(cfg: CurveCfg, P: Jac, k: int) -> Jac:
    k %= cfg.r
    acc = JAC_INF
    while k:
        if k & 1:
            acc = jac_add(cfg, acc, P)
        P = jac_double(cfg, P)
        k >>= 1
    return acc


def batch_normalize(cfg: CurveCfg, pts: list[Jac]) -> list[Affine]:
    """Batch Jacobian->affine using a single inversion (Montgomery trick)."""
    p = cfg.p
    zs = [P[2] for P in pts]
    prefix = [1] * (len(zs) + 1)
    for i, z in enumerate(zs):
        prefix[i + 1] = prefix[i] * (z if z != 0 else 1) % p
    total_inv = inv(prefix[-1], p)
    out: list[Affine] = [None] * len(pts)
    for i in range(len(pts) - 1, -1, -1):
        X, Y, Z = pts[i]
        if Z == 0:
            out[i] = None
            continue
        zinv = total_inv * prefix[i] % p
        total_inv = total_inv * Z % p
        zinv2 = zinv * zinv % p
        out[i] = (X * zinv2 % p, Y * zinv2 % p * zinv % p)
    return out


def msm_host(cfg: CurveCfg, scalars: list[int], points: list[Affine]) -> Affine:
    """Pippenger MSM on the host tier (small sizes / cross-checks only).

    The device tier Pippenger (halo_tpu/ops/msm.py) is the production path;
    mirrors reference crates/group/src/group.rs:48-56 semantics
    (msm_unchecked: no subgroup checks, scalars already reduced).
    """
    n = len(scalars)
    assert len(points) >= n
    if n == 0:
        return None
    w = max(2, min(16, n.bit_length()))  # window bits
    nwin = (256 + w - 1) // w
    total = JAC_INF
    for win in range(nwin - 1, -1, -1):
        shift = win * w
        buckets: list[Jac] = [JAC_INF] * (1 << w)
        for s, pt in zip(scalars, points):
            digit = (s >> shift) & ((1 << w) - 1)
            if digit and pt is not None:
                buckets[digit] = jac_add(cfg, buckets[digit], to_jac(pt))
        running = JAC_INF
        acc = JAC_INF
        for d in range((1 << w) - 1, 0, -1):
            running = jac_add(cfg, running, buckets[d])
            acc = jac_add(cfg, acc, running)
        for _ in range(w):
            total = jac_double(cfg, total)
        total = jac_add(cfg, total, acc)
    return from_jac(cfg, total)


def decompress_point(cfg: CurveCfg, x: int, y_is_negative: bool) -> Affine:
    """Recover the affine point from x + sign flag (ark SW compressed form).

    ark's convention: the 'positive' root is min(y, p-y); flag set => take
    the larger root.
    """
    rhs = (x * x % cfg.p * x + cfg.b) % cfg.p
    y = sqrt(rhs, cfg.p)
    if y is None:
        raise ValueError("x is not on the curve")
    smaller, larger = (y, cfg.p - y) if y <= cfg.p - y else (cfg.p - y, y)
    return (x, larger if y_is_negative else smaller)

"""PCDL: IPA (bulletproofs-style) polynomial commitments over the Pasta SRS.

Host-tier implementation of the reference protocol
(crates/accumulation/src/pcdl.rs):

  commit(p, d, w)       Pedersen commit to coefficients:  MSM(Gs, p) + w*S
  open(p, C, d, z, w)   lg(n)-round IPA folding proof that p(z) = v
  succinct_check(...)   O(lg n) transcript replay returning (HPoly, U)
  check(...)            succinct_check + recompute U = MSM(Gs, h_coeffs)

Polynomials are little-endian int coefficient lists.  The MSM/fold backend
is pluggable: the host Pippenger is the default; the device tier
(halo_tpu/ops/msm.py) is swapped in via set_backend for large sizes.
Randomness is injectable for reproducible hiding proofs.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import Callable, Optional

from .curves import (
    Affine,
    CurveCfg,
    batch_normalize,
    ec_add,
    ec_mul,
    from_jac,
    jac_add,
    jac_mul,
    msm_host,
    to_jac,
)
from .fields import inv
from .errors import PcdlCheckError
from .poseidon.sponge import Protocols, Sponge
from .serde import Reader, Writer
from .srs import load_srs

# ---------------- pluggable MSM backend ---------------- #

# signature: msm(cfg, scalars: list[int], points: list[Affine]) -> Affine
_MSM_BACKEND: Callable = None  # set lazily


def set_msm_backend(fn: Callable | None) -> None:
    global _MSM_BACKEND
    _MSM_BACKEND = fn


def _msm(cfg: CurveCfg, scalars, points) -> Affine:
    if _MSM_BACKEND is not None:
        return _MSM_BACKEND(cfg, scalars, points)
    from . import native

    if native.available() and len(scalars) >= 8:
        return native.msm(cfg, scalars, points)
    return msm_host(cfg, scalars, points)


from .config import get_config

# below this size the native host Pippenger beats device dispatch overhead
# (v2 device MSM pads to 4096 lanes; native C++ does 2048 points in ~40 ms)
DEVICE_MSM_MIN = get_config().device_msm_min
# minimum n for the device IPA fold loop (ops/ipa.py)
DEVICE_OPEN_MIN = get_config().device_open_min


def _srs_msm(cfg: CurveCfg, scalars: list[int]) -> Affine:
    """MSM against the first len(scalars) SRS generators (device-aware)."""
    from .ops import msm as device_msm

    if device_msm.available() and len(scalars) >= DEVICE_MSM_MIN:
        return device_msm.msm_srs(cfg, scalars)
    pp = load_srs(cfg.name, _pp_size(cfg, len(scalars)))
    return _msm(cfg, scalars, pp.gs_ints(len(scalars)))


def _pp_size(cfg: CurveCfg, n: int) -> int:
    size = 1
    while size < n:
        size *= 2
    return max(size, 4)


# ---------------- data structures ---------------- #


@dataclass
class EvalProof:
    Ls: list[Affine]
    Rs: list[Affine]
    U: Affine
    c: int
    C_bar: Optional[Affine] = None
    w_prime: Optional[int] = None

    @classmethod
    def deserialize(cls, r: Reader, cfg: CurveCfg) -> "EvalProof":
        return cls(
            Ls=r.vec(lambda: r.point_compressed(cfg)),
            Rs=r.vec(lambda: r.point_compressed(cfg)),
            U=r.point_compressed(cfg),
            c=r.field(cfg.r),
            C_bar=r.option(lambda: r.point_compressed(cfg)),
            w_prime=r.option(lambda: r.field(cfg.r)),
        )

    def serialize(self, w: Writer, cfg: CurveCfg) -> None:
        w.vec(self.Ls, lambda p: w.point_compressed(cfg, p))
        w.vec(self.Rs, lambda p: w.point_compressed(cfg, p))
        w.point_compressed(cfg, self.U)
        w.field(self.c)
        w.option(self.C_bar, lambda p: w.point_compressed(cfg, p))
        w.option(self.w_prime, lambda v: w.field(v))


@dataclass
class HPoly:
    """h(X) := prod_{i=0}^{lg n - 1} (1 + xi_{lg n - i} X^(2^i)); xis[0] unused."""

    xis: list[int]
    r: int  # scalar field modulus

    def eval(self, z: int) -> int:
        m = self.r
        lg_n = len(self.xis) - 1
        v = (1 + self.xis[lg_n] * z) % m
        z_i = z
        for i in range(1, lg_n):
            z_i = z_i * z_i % m
            v = v * (1 + self.xis[lg_n - i] * z_i) % m
        return v

    def coeffs(self) -> list[int]:
        m = self.r
        lg_n = len(self.xis) - 1
        out = [1]
        for i in range(lg_n):
            xi = self.xis[lg_n - i]
            out = out + [c * xi % m for c in out]
        return out


@dataclass
class Instance:
    C: Affine
    d: int
    z: int
    v: int
    pi: EvalProof

    @classmethod
    def deserialize(cls, r: Reader, cfg: CurveCfg) -> "Instance":
        return cls(
            C=r.point_compressed(cfg),
            d=r.u64(),
            z=r.field(cfg.r),
            v=r.field(cfg.r),
            pi=EvalProof.deserialize(r, cfg),
        )

    def serialize(self, w: Writer, cfg: CurveCfg) -> None:
        w.point_compressed(cfg, self.C)
        w.u64(self.d)
        w.field(self.z)
        w.field(self.v)
        self.pi.serialize(w, cfg)

    @classmethod
    def open(
        cls, cfg: CurveCfg, p: list[int], d: int, z: int, w: int | None = None, rng=None
    ) -> "Instance":
        C = commit(cfg, p, d, w)
        v = poly_eval(cfg, p, z)
        pi = open_without_eval(cfg, p, C, d, z, v, w, rng=rng)
        return cls(C=C, d=d, z=z, v=v, pi=pi)

def poly_eval(cfg: CurveCfg, coeffs: list[int], z: int) -> int:
    m = cfg.r
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % m
    return acc


# ---------------- protocol functions ---------------- #


def commit(cfg: CurveCfg, p: list[int], d: int, w: int | None = None) -> Affine:
    """Pedersen commit to coefficients (reference pcdl.rs:275-287)."""
    n = d + 1
    assert n & (n - 1) == 0, "n must be a power of two"
    assert len(p) <= n
    acc = _srs_msm(cfg, [c % cfg.r for c in p])
    if w is not None:
        pp = load_srs(cfg.name, _pp_size(cfg, n))
        acc = ec_add(cfg, acc, ec_mul(cfg, pp.S, w))
    return acc


def chunked_commit(
    cfg: CurveCfg, p: list[int], d: int, w: int | None = None, chunk_size: int = 1 << 10
) -> list[Affine]:
    """Commit coefficient chunks separately (reference pcdl.rs:294-314):
    the degree-scaling mechanism for polynomials past the SRS bound."""
    n = d + 1
    assert n & (n - 1) == 0, "n must be a power of two"
    out = []
    for i in range(0, max(len(p), 1), chunk_size):
        chunk = [c % cfg.r for c in p[i : i + chunk_size]]
        acc = _srs_msm(cfg, chunk)
        if w is not None:
            pp = load_srs(cfg.name, _pp_size(cfg, n))
            acc = ec_add(cfg, acc, ec_mul(cfg, pp.S, w))
        out.append(acc)
    return out


def open_without_eval(
    cfg: CurveCfg,
    p: list[int],
    C: Affine,
    d: int,
    z: int,
    v: int,
    w: int | None = None,
    rng=None,
) -> EvalProof:
    """IPA opening proof (reference pcdl.rs:326-453)."""
    n = d + 1
    lg_n = n.bit_length() - 1
    assert n > 1 and n & (n - 1) == 0
    assert len(p) <= n
    m = cfg.r

    if w is None and n >= DEVICE_OPEN_MIN:
        from .ops.ipa import open_without_eval_device

        return open_without_eval_device(cfg, p, C, d, z, v)

    pp = load_srs(cfg.name, _pp_size(cfg, n))
    transcript = Sponge(Protocols.PCDL, cfg)

    if w is not None:
        if rng is None:
            rng = secrets.SystemRandom()
        # p_bar(X) = (X - z) * q(X), q uniform of degree d-1  (pcdl.rs:344-349)
        q = [rng.randrange(m) for _ in range(d)]
        p_bar = [0] * (d + 1)
        for i, qc in enumerate(q):
            p_bar[i + 1] = (p_bar[i + 1] + qc) % m
            p_bar[i] = (p_bar[i] - qc * z) % m
        w_bar = rng.randrange(m)
        C_bar = commit(cfg, p_bar, d, w_bar)
        transcript.absorb_g([C, C_bar])
        transcript.absorb_fr([z, v])
        a = transcript.challenge()
        p_prime = [(pc + a * bc) % m for pc, bc in zip(p + [0] * (d + 1 - len(p)), p_bar)]
        w_prime = (w_bar * a + w) % m
        C_prime = ec_add(
            cfg,
            ec_add(cfg, C, ec_mul(cfg, C_bar, a)),
            ec_mul(cfg, (pp.S[0], (-pp.S[1]) % cfg.p), w_prime),
        )
    else:
        p_prime = list(p)
        C_prime = C
        C_bar = None
        w_prime = None

    # xi_0 := rho(C', z, v); H' := xi_0 * H   (pcdl.rs:387-390)
    transcript.absorb_g([C_prime])
    transcript.absorb_fr([z, v])
    xi_i = transcript.challenge()
    H_prime = to_jac(ec_mul(cfg, pp.H, xi_i))

    cs = [c % m for c in p_prime] + [0] * (n - len(p_prime))
    gs = pp.gs_ints(n)
    zs = []
    cur = 1
    for _ in range(n):
        zs.append(cur)
        cur = cur * z % m

    Ls: list[Affine] = []
    Rs: list[Affine] = []
    mhalf = n // 2
    for _ in range(lg_n):
        cs_l, cs_r = cs[:mhalf], cs[mhalf : 2 * mhalf]
        zs_l, zs_r = zs[:mhalf], zs[mhalf : 2 * mhalf]
        gs_l, gs_r = gs[:mhalf], gs[mhalf : 2 * mhalf]

        from . import native

        use_native = native.available() and mhalf >= 8
        if use_native:
            dot_l = native.scalar_dot(m, cs_r, zs_l)
            dot_r = native.scalar_dot(m, cs_l, zs_r)
        else:
            dot_l = sum(c * zz for c, zz in zip(cs_r, zs_l)) % m
            dot_r = sum(c * zz for c, zz in zip(cs_l, zs_r)) % m
        L = from_jac(cfg, jac_add(cfg, to_jac(_msm(cfg, cs_r, gs_l)), jac_mul(cfg, H_prime, dot_l)))
        Ls.append(L)
        R = from_jac(cfg, jac_add(cfg, to_jac(_msm(cfg, cs_l, gs_r)), jac_mul(cfg, H_prime, dot_r)))
        Rs.append(R)

        transcript.absorb_fr([xi_i])
        transcript.absorb_g([L, R])
        xi_next = transcript.challenge()
        xi_next_inv = inv(xi_next, m)
        xi_i = xi_next

        # fold: G <- G_L + xi*G_R ; c <- c_L + xi^-1 c_R ; z <- z_L + xi z_R
        if use_native:
            gs = native.ec_fold(cfg, gs_l, gs_r, xi_next)
            cs = native.batch_axpy(m, cs_l, cs_r, xi_next_inv)
            zs = native.batch_axpy(m, zs_l, zs_r, xi_next)
        else:
            folded = [
                jac_add(cfg, to_jac(gl), jac_mul(cfg, to_jac(gr), xi_next))
                for gl, gr in zip(gs_l, gs_r)
            ]
            gs = batch_normalize(cfg, folded)
            cs = [(cl + cr * xi_next_inv) % m for cl, cr in zip(cs_l, cs_r)]
            zs = [(zl + zr * xi_next) % m for zl, zr in zip(zs_l, zs_r)]
        mhalf //= 2

    return EvalProof(Ls=Ls, Rs=Rs, U=gs[0], c=cs[0], C_bar=C_bar, w_prime=w_prime)


def open_proof(
    cfg: CurveCfg, p: list[int], C: Affine, d: int, z: int, w: int | None = None, rng=None
) -> EvalProof:
    v = poly_eval(cfg, p, z)
    return open_without_eval(cfg, p, C, d, z, v, w, rng=rng)


def succinct_check(
    cfg: CurveCfg, C: Affine, d: int, z: int, v: int, pi: EvalProof
) -> tuple[HPoly, Affine]:
    """O(lg n) check; returns (h, U) (reference pcdl.rs:483-554)."""
    n = d + 1
    lg_n = n.bit_length() - 1
    assert n & (n - 1) == 0
    m = cfg.r
    from .srs import load_sh

    S, H = load_sh(cfg.name)
    transcript = Sponge(Protocols.PCDL, cfg)

    if pi.C_bar is not None:
        transcript.absorb_g([C, pi.C_bar])
        transcript.absorb_fr([z, v])
        a = transcript.challenge()
        C_prime = ec_add(
            cfg,
            ec_add(cfg, C, ec_mul(cfg, pi.C_bar, a)),
            ec_mul(cfg, (S[0], (-S[1]) % cfg.p), pi.w_prime),
        )
    else:
        C_prime = C

    transcript.absorb_g([C_prime])
    transcript.absorb_fr([z, v])
    xi_0 = transcript.challenge()
    xis = [xi_0]
    H_prime = ec_mul(cfg, H, xi_0)

    C_i = jac_add(cfg, to_jac(C_prime), jac_mul(cfg, to_jac(H_prime), v))

    for i in range(lg_n):
        transcript.absorb_fr([xis[i]])
        transcript.absorb_g([pi.Ls[i], pi.Rs[i]])
        xi_next = transcript.challenge()
        xis.append(xi_next)
        C_i = jac_add(cfg, C_i, jac_mul(cfg, to_jac(pi.Ls[i]), inv(xi_next, m)))
        C_i = jac_add(cfg, C_i, jac_mul(cfg, to_jac(pi.Rs[i]), xi_next))

    h = HPoly(xis=xis, r=m)
    v_prime = pi.c * h.eval(z) % m
    rhs = jac_add(cfg, jac_mul(cfg, to_jac(pi.U), pi.c), jac_mul(cfg, to_jac(H_prime), v_prime))
    if from_jac(cfg, C_i) != from_jac(cfg, rhs):
        raise PcdlCheckError("succinct_check failed: C_lg != U*c + H'*(c*h(z))")
    return h, pi.U


def check(cfg: CurveCfg, C: Affine, d: int, z: int, v: int, pi: EvalProof) -> None:
    """Full (linear-time) check (reference pcdl.rs:563-583)."""
    h, U = succinct_check(cfg, C, d, z, v, pi)
    comm = _srs_msm(cfg, h.coeffs())
    if U != comm:
        raise PcdlCheckError("check failed: U != MSM(Gs, h_coeffs)")

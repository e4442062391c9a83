"""Device-tier IPA open: the lg(n) fold loop on batched limb arrays.

The reference's hottest prover loop (crates/accumulation/src/pcdl.rs:404-438)
re-done TPU-style: per round, the two MSMs and the three folds are batched
device ops; only the 2-point transcript round-trip touches the host
(SURVEY.md §7.4 item 6).  The G-fold — the reference's biggest inefficiency
(a full scalar-mul per point) — is one batched 255-step double-and-add over
the whole half-vector.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..curves import Affine, CurveCfg, ec_add, ec_mul
from ..fields import inv
from ..poseidon.sponge import Protocols, Sponge
from . import ec, ff, msm as msm_ops
from .ec import ECCtx, Point
from .ff import NLIMBS, U32


def _to_affine_one(ctx: ECCtx, P: Point) -> Affine:
    return ec.to_affine_ints(ctx, tuple(c[None] for c in P))[0]


def _field_dot(fctx, a: jnp.ndarray, b: jnp.ndarray, m: int) -> int:
    """<a, b> over the scalar field; inputs Montgomery (n,16), result int."""
    from ..plonk.engine import _chunk_sum_jit

    prods = ff.mont_mul_jit(fctx, a, b)
    partial = np.asarray(_chunk_sum_jit(prods), dtype=np.uint64)  # (g, 16) u32-exact
    cols = partial.sum(axis=0, dtype=object)
    v = sum(int(c) << (16 * i) for i, c in enumerate(cols))
    return v % m * pow(1 << 256, -1, m) % m


def open_without_eval_device(
    cfg: CurveCfg, p: list[int], C: Affine, d: int, z: int, v: int
) -> "EvalProof":
    """Non-hiding IPA open with the folds on device (bit-identical to host)."""
    from .. import pcdl
    from ..srs import load_srs

    n = d + 1
    lg_n = n.bit_length() - 1
    m = cfg.r
    ectx = ec.ec_ctx(cfg)
    fctx = ff.ctx_for(m)
    pp = load_srs(cfg.name, max(4, n))
    transcript = Sponge(Protocols.PCDL, cfg)

    transcript.absorb_g([C])
    transcript.absorb_fr([z, v])
    xi_i = transcript.challenge()
    H_prime = ec_mul(cfg, pp.H, xi_i)

    # device state
    cs = ff.to_mont_jit(fctx, jnp.asarray(ff.ints_to_array([c % m for c in p] + [0] * (n - len(p)))))
    zpows = [0] * n
    cur = 1
    for i in range(n):
        zpows[i] = cur
        cur = cur * z % m
    zs = ff.to_mont_jit(fctx, jnp.asarray(ff.ints_to_array(zpows)))
    gs = ec.from_limbs_canonical(ectx, pp.gs_x[:n], pp.gs_y[:n])
    Hp = ec.from_affine_ints(ectx, [H_prime])
    Hp1 = tuple(c[0] for c in Hp)

    Ls: list[Affine] = []
    Rs: list[Affine] = []
    mhalf = n // 2
    for _ in range(lg_n):
        cs_l, cs_r = cs[:mhalf], cs[mhalf:]
        zs_l, zs_r = zs[:mhalf], zs[mhalf:]
        gs_l = tuple(c[:mhalf] for c in gs)
        gs_r = tuple(c[mhalf:] for c in gs)

        dot_l = _field_dot(fctx, cs_r, zs_l, m)
        dot_r = _field_dot(fctx, cs_l, zs_r, m)

        cs_r_canon = jnp.asarray(
            np.asarray(ff.from_mont_jit(fctx, cs_r), dtype=np.uint32)
        )
        cs_l_canon = jnp.asarray(
            np.asarray(ff.from_mont_jit(fctx, cs_l), dtype=np.uint32)
        )
        if mhalf >= 2:
            Lmsm = msm_ops.msm_naive_jit(ectx, gs_l, cs_r_canon)
            Rmsm = msm_ops.msm_naive_jit(ectx, gs_r, cs_l_canon)
            Lpt = _to_affine_one(ectx, Lmsm)
            Rpt = _to_affine_one(ectx, Rmsm)
        else:
            gl = ec.to_affine_ints(ectx, gs_l)[0]
            gr = ec.to_affine_ints(ectx, gs_r)[0]
            cl = ff.array_to_ints(np.asarray(cs_l_canon))[0]
            crv = ff.array_to_ints(np.asarray(cs_r_canon))[0]
            Lpt = ec_mul(cfg, gl, crv)
            Rpt = ec_mul(cfg, gr, cl)
        L = ec_add(cfg, Lpt, ec_mul(cfg, H_prime, dot_l))
        R = ec_add(cfg, Rpt, ec_mul(cfg, H_prime, dot_r))
        Ls.append(L)
        Rs.append(R)

        transcript.absorb_fr([xi_i])
        transcript.absorb_g([L, R])
        xi_next = transcript.challenge()
        xi_next_inv = inv(xi_next, m)
        xi_i = xi_next

        xi_dev = ff.to_mont_jit(fctx, jnp.asarray(ff.ints_to_array([xi_next])))[0]
        xi_inv_dev = ff.to_mont_jit(fctx, jnp.asarray(ff.ints_to_array([xi_next_inv])))[0]
        xi_limbs = jnp.asarray(ff.ints_to_array([xi_next]))  # canonical for scalar_mul

        scaled = ec.scalar_mul_jit(ectx, gs_r, xi_limbs)
        gs = ec.add_jit(ectx, gs_l, scaled)
        cs = ff.add_jit(fctx, cs_l, ff.mont_mul_jit(fctx, cs_r, xi_inv_dev))
        zs = ff.add_jit(fctx, zs_l, ff.mont_mul_jit(fctx, zs_r, xi_dev))
        mhalf //= 2

    U = _to_affine_one(ectx, tuple(c[0] for c in gs))
    c_final = ff.array_to_ints(np.asarray(ff.from_mont_jit(fctx, cs[:1])))[0]
    return pcdl.EvalProof(Ls=Ls, Rs=Rs, U=U, c=c_final, C_bar=None, w_prime=None)

"""Device-tier IPA open: the lg(n) fold loop on batched limb arrays.

The reference's hottest prover loop (crates/accumulation/src/pcdl.rs:404-438)
re-done TPU-style: per round, the two MSMs and the three folds are batched
device ops; only the 2-point transcript round-trip touches the host
(SURVEY.md §7.4 item 6).  The G-fold — the reference's biggest inefficiency
(a full scalar-mul per point) — is one batched 255-step double-and-add over
the whole half-vector.

Shape discipline: every round runs at the FIXED padded shape n/2 with a
dynamic active-length mask (inactive scalars zeroed -> contribute identity;
vectors re-packed with a dynamic roll).  A shape-per-round version compiled
2*lg(n) distinct MSM/scalar-mul graphs per open — ~30 min of XLA compiles at
n=2^12 through the axon tunnel before the first byte of work.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Affine, CurveCfg, ec_add, ec_mul
from ..fields import inv
from ..poseidon.sponge import Protocols, Sponge
from . import ec, ecrows, ff, msm as msm_ops, pallas_mont as pk
from .ec import ECCtx, Point
from .ff import NLIMBS, U32


def _rows_point_to_affine(p_mod: int, P) -> Affine:
    """1-lane rows point (quasi-2p projective) -> host affine ints."""
    limbs = [int(ff.limbs_to_int(np.asarray(c)[:, 0])) for c in P]
    x, y, z = [v % p_mod for v in limbs]
    if z == 0:
        return None
    zi = pow(z, -1, p_mod)  # Montgomery R factors cancel in x/z, y/z
    return (x * zi % p_mod, y * zi % p_mod)


def _field_dot(fctx, a: jnp.ndarray, b: jnp.ndarray, m: int) -> int:
    """<a, b> over the scalar field; inputs Montgomery (n,16), result int."""
    from ..plonk.engine import _chunk_sum_jit

    prods = ff.mont_mul_jit(fctx, a, b)
    partial = np.asarray(_chunk_sum_jit(prods), dtype=np.uint64)  # (g, 16) u32-exact
    cols = partial.sum(axis=0, dtype=object)
    v = sum(int(c) << (16 * i) for i, c in enumerate(cols))
    return v % m * pow(1 << 256, -1, m) % m


@lru_cache(maxsize=16)
def _round_fns(ectx: ECCtx, fctx, P: int):
    """Fixed-shape jitted halves of one fold round (compiled once per
    shape class).

    f1: masked cross dots + the two L/R MSM points (before the transcript).
    f2: fold cs/zs/gs with the round challenge and re-split at the new
        active length a2 (dynamic roll; tail garbage is masked next round).

    The G vectors live in rows layout on the v2 kernels (ops/ecrows.py):
    the v1 fused-EC pallas bodies embedded ~4000 Mosaic ops per call into
    the enclosing MLIR, which made these graphs take tens of minutes just
    to lower at production sizes.
    """
    mctx = pk.mont_ctx(ectx.p, ectx.b)

    def f1(cs_l, cs_r, zs_l, zs_r, gs_l, gs_r, a):
        mask = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) < a
        dl = jnp.where(mask, ff.mont_mul(fctx, cs_r, zs_l), 0)  # summed on host
        dr = jnp.where(mask, ff.mont_mul(fctx, cs_l, zs_r), 0)
        # canonical scalars, zeroed outside the active prefix -> identity
        sc_r = jnp.transpose(jnp.where(mask, ff.from_mont(fctx, cs_r), 0))
        sc_l = jnp.transpose(jnp.where(mask, ff.from_mont(fctx, cs_l), 0))
        Lmsm = ecrows.msm_naive_rows(mctx, gs_l, sc_r)
        Rmsm = ecrows.msm_naive_rows(mctx, gs_r, sc_l)
        return dl, dr, Lmsm, Rmsm

    def f2(cs_l, cs_r, zs_l, zs_r, gs_l, gs_r, a2, xi_mont, xi_inv_mont, xi_limbs):
        cs = ff.add(fctx, cs_l, ff.mont_mul(fctx, cs_r, xi_inv_mont))
        zs = ff.add(fctx, zs_l, ff.mont_mul(fctx, zs_r, xi_mont))
        gs = ecrows.padd(
            mctx, gs_l, ecrows.scalar_mul_rows(mctx, gs_r, xi_limbs[:, None]))
        roll = lambda x: jnp.roll(x, -a2, axis=0)
        rollr = lambda x: jnp.roll(x, -a2, axis=1)
        return (cs, roll(cs), zs, roll(zs), gs, tuple(rollr(c) for c in gs))

    return jax.jit(f1), jax.jit(f2)


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

    if n == 1:  # lg(n) = 0: no fold rounds; U = G_0, c = p_0 (host version)
        return pcdl.EvalProof(Ls=[], Rs=[], U=pp.gs_ints(1)[0],
                              c=(p[0] % m if p else 0), C_bar=None, w_prime=None)

    # device state at the fixed half shape P = n/2; `a` = active prefix length
    cs = ff.to_mont_jit(fctx, jnp.asarray(ff.ints_to_array([c % m for c in p] + [0] * (n - len(p)))))
    zpows = [0] * n
    cur = 1
    for i in range(n):
        zpows[i] = cur
        cur = cur * z % m
    zs = ff.to_mont_jit(fctx, jnp.asarray(ff.ints_to_array(zpows)))
    bctx = ff.ctx_for(cfg.p)
    gx = ff.to_mont_jit(bctx, jnp.asarray(pp.gs_x[:n], U32))
    gy = ff.to_mont_jit(bctx, jnp.asarray(pp.gs_y[:n], U32))
    one_rows = jnp.broadcast_to(
        jnp.asarray(ff.int_to_limbs((1 << 256) % cfg.p), U32)[:, None], (NLIMBS, n))
    gs = (jnp.transpose(gx), jnp.transpose(gy), one_rows)

    P = n // 2
    f1, f2 = _round_fns(ectx, fctx, P)
    cs_l, cs_r = cs[:P], cs[P:]
    zs_l, zs_r = zs[:P], zs[P:]
    gs_l = tuple(c[:, :P] for c in gs)
    gs_r = tuple(c[:, P:] for c in gs)

    def exact_sum(prods) -> int:
        from ..plonk.engine import _chunk_sum_jit

        partial = np.asarray(_chunk_sum_jit(prods), dtype=np.uint64)
        cols = partial.sum(axis=0, dtype=object)
        v = sum(int(c) << (16 * i) for i, c in enumerate(cols))
        return v % m * pow(1 << 256, -1, m) % m

    Ls: list[Affine] = []
    Rs: list[Affine] = []
    a = P
    cur_P = P
    for _ in range(lg_n):
        # Re-pack to the active prefix once it shrinks 4x: the fixed-shape
        # rounds otherwise run EVERY round at the full padded width (masked
        # lanes still cost adds), which made the fold ~6x more expensive
        # than the active work; a few shape classes (P, P/4, P/16, ...)
        # keep compiles bounded while work tracks the live size.
        if a >= 64 and 4 * a <= cur_P:
            cur_P = a
            cs_l, cs_r = cs_l[:a], cs_r[:a]
            zs_l, zs_r = zs_l[:a], zs_r[:a]
            gs_l = tuple(c[:, :a] for c in gs_l)
            gs_r = tuple(c[:, :a] for c in gs_r)
            f1, f2 = _round_fns(ectx, fctx, cur_P)
        dl_prods, dr_prods, Lmsm, Rmsm = f1(
            cs_l, cs_r, zs_l, zs_r, gs_l, gs_r, jnp.int32(a)
        )
        dot_l = exact_sum(dl_prods)
        dot_r = exact_sum(dr_prods)
        Lpt = _rows_point_to_affine(cfg.p, Lmsm)
        Rpt = _rows_point_to_affine(cfg.p, Rmsm)
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
        xi_limbs = jnp.asarray(ff.ints_to_array([xi_next]))[0]  # canonical

        a //= 2
        cs_l, cs_r, zs_l, zs_r, gs_l, gs_r = f2(
            cs_l, cs_r, zs_l, zs_r, gs_l, gs_r,
            jnp.int32(a), xi_dev, xi_inv_dev, xi_limbs,
        )

    U = _rows_point_to_affine(cfg.p, tuple(c[:, :1] for c in gs_l))
    c_final = ff.array_to_ints(np.asarray(ff.from_mont_jit(fctx, cs_l[:1])))[0]
    return pcdl.EvalProof(Ls=Ls, Rs=Rs, U=U, c=c_final, C_bar=None, w_prime=None)

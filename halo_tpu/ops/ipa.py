"""Device-tier IPA open: the lg(n) fold loop, TPU-first.

The reference's hottest prover loop (crates/accumulation/src/pcdl.rs:404-438)
folds three vectors per round and pays a full scalar-mul per surviving G
point.  This implementation never folds G at all.  Expanding the fold
recurrence, after k-1 rounds each folded point is a ξ-weighted sum of
original SRS points:

    G^(k-1)_j = sum_{m : m mod l == j} gw_m * G_m,
    gw_m = prod_{i<k} xi_i^{bit_i(m)},   bit_i(m) = bit (lg n - i) of m,

so every round's L/R is ONE windowed MSM over the ORIGINAL (affine,
already-packed) SRS rows with derived scalars:

    L_k = MSM(G[idxL], gw[idxL] * c^(k-1)[(m mod l) + h])      (n/2 points)
    R_k = MSM(G[idxR], gw[idxR] * c^(k-1)[(m mod l)])          (n/2 points)
    U   = MSM(G, gw)          after the last round  (n points)

Consequences, vs the round-3 double-and-add fold:
  * no 255-step scalar_mul_rows per round (the dominant cost),
  * no projective G state / normalization — the MSM consumes the same
    packed affine SRS rows as the commit path (ops/msm2.py),
  * EVERY round has the same shapes (cs/zs/gw fixed length n, MSMs fixed
    size n/2) -> exactly two compiled graphs for the whole open, replacing
    the per-shape-class compile ladder,
  * the scalar derivation is ~6n cheap field muls per round.

Only the 2-point transcript round-trip touches the host per round
(SURVEY.md §7.4 item 6).  Bit-identical to the host open: the algebra is
exact, so L/R/U/c equal the reference's bytes (tests/test_device_pipeline).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Affine, CurveCfg, ec_add, ec_mul
from ..fields import inv
from ..poseidon.sponge import Protocols, Sponge
from . import ff, msm2, pallas_mont as pk
from .ff import NLIMBS, U32

# window width for the per-round half MSMs: their sizes (n/2 <= 2^19) sit
# well below msm2's c=16 crossover (~2^18 it is close; the fixed ~0.3 s
# c=16 aggregation would dominate 2*lg n calls)
FOLD_C_BITS = 8

# scan stride for the fold MSMs (msm2._msm2_multi stride=...): folding S
# sorted points per scan step with masked boundary fix-ups.  ABLATION
# (round 5, on-chip): stride=8 measured 3.33 s vs 3.26 s at stride=1 for
# the 2^16 open — no win, because the scan step is VPU-COMPUTE-bound
# (13 Montgomery muls x 32k lanes ~ 1.5 ms), not dispatch-latency-bound;
# striding moves the same muls into longer steps and adds fix-up work.
# This independently confirms the round-4 roofline note: further gains
# need a cheaper point representation (fewer muls per add), not fewer
# dispatches.  The machinery stays (tested in tests/test_msm2.py) for
# hardware where step latency dominates.
FOLD_STRIDE = 1


def _fold_lanes(n_msm: int) -> int:
    """Wider lanes than the standalone MSM default: the fold runs 2*lg(n)
    of these back-to-back, so scan DEPTH (R = n/lanes sequential kernel
    steps) dominates; R = 32 keeps the per-round latency low while the
    per-step width (windows * lanes) still tiles fine."""
    lanes = max(16, min(n_msm // 32, 8192, n_msm))
    assert n_msm % lanes == 0, (n_msm, lanes)
    return lanes


@partial(jax.jit, static_argnums=(0, 1, 2))
def _round_msms_jit(mctx: pk.MontCtx, fctx, n: int,
                    xy_pack, cs, zs, gw, h, idxL, idxR, cspL, cspR):
    """One fold round's device work BEFORE the transcript: the two masked
    cross dots (returned as u32-exact chunk partials) and the two half-size
    windowed MSMs over original SRS rows."""
    from ..plonk.engine import _chunk_sum_jit

    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    mask = iota < h
    dl = jnp.where(mask, ff.mont_mul(fctx, jnp.roll(cs, -h, axis=0), zs), 0)
    dr = jnp.where(mask, ff.mont_mul(fctx, cs, jnp.roll(zs, -h, axis=0)), 0)

    # idx/csp arrays are padded to >= 16 lanes (tiny-n tests); zero the
    # scalars of the pad lanes so they land in the dead bucket
    n_msm = idxL.shape[0]
    vmask = jax.lax.broadcasted_iota(jnp.int32, (n_msm, 1), 0) < (n // 2)
    sL = jnp.where(vmask, ff.from_mont(fctx, ff.mont_mul(fctx, gw[idxL], cs[cspL])), 0)
    sR = jnp.where(vmask, ff.from_mont(fctx, ff.mont_mul(fctx, gw[idxR], cs[cspR])), 0)
    lanes = _fold_lanes(n_msm)
    SL = msm2._msm2_device(mctx, n_msm, lanes, FOLD_C_BITS,
                           xy_pack[:, idxL], jnp.transpose(sL),
                           stride=FOLD_STRIDE)
    SR = msm2._msm2_device(mctx, n_msm, lanes, FOLD_C_BITS,
                           xy_pack[:, idxR], jnp.transpose(sR),
                           stride=FOLD_STRIDE)
    return _chunk_sum_jit(dl), _chunk_sum_jit(dr), SL, SR


@partial(jax.jit, static_argnums=(0, 1))
def _fold_state_jit(fctx, n: int, cs, zs, gw, h, xi_mont, xi_inv_mont):
    """Post-transcript state update: fold cs/zs at the active prefix, fold
    the round challenge into the G-weight vector."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    mask = iota < h
    cs = jnp.where(mask, ff.add(fctx, cs, ff.mont_mul(
        fctx, jnp.roll(cs, -h, axis=0), xi_inv_mont)), 0)
    zs = jnp.where(mask, ff.add(fctx, zs, ff.mont_mul(
        fctx, jnp.roll(zs, -h, axis=0), xi_mont)), 0)
    bit = ((iota // jnp.maximum(h, 1)) & 1) == 1  # bit_k(m) blocks of h
    gw = jnp.where(bit, ff.mont_mul(fctx, gw, xi_mont), gw)
    return cs, zs, gw


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _u_msm_jit(mctx: pk.MontCtx, fctx, n: int, c_bits: int, xy_pack, gw):
    K = jnp.transpose(ff.from_mont(fctx, gw))
    lanes = _fold_lanes(n)
    return msm2._msm2_device(mctx, n, lanes, c_bits, xy_pack, K,
                             stride=FOLD_STRIDE)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _round_msms_pair_jit(mctx: pk.MontCtx, fctx, n: int,
                         xy_pack, cs, zs, gw, h, csiL, csiR, maskL):
    """One fold round's device work for TWO independent opens at once:
    cs/zs/gw are (2, n, 16) stacks, and all four half-MSMs (L/R x both
    opens) run as ONE _msm2_multi dispatch over the full SRS pack with
    full-length masked scalars and skip = n/2 (each window of a scalar
    vector that is zero on half its support has >= n/2 zero-digit lanes,
    which sort to the front — the skip machinery _msm2_multi was built
    for).  One dispatch + one host pull per round instead of two."""
    from ..plonk.engine import _chunk_sum_jit

    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    mask = iota < h
    dl = jnp.where(mask, ff.mont_mul(fctx, jnp.roll(cs, -h, axis=-2), zs), 0)
    dr = jnp.where(mask, ff.mont_mul(fctx, cs, jnp.roll(zs, -h, axis=-2)), 0)

    mL = maskL[None, :, None]
    sL = jnp.where(mL, ff.from_mont(fctx, ff.mont_mul(fctx, gw, cs[:, csiL])), 0)
    sR = jnp.where(~mL, ff.from_mont(fctx, ff.mont_mul(fctx, gw, cs[:, csiR])), 0)
    # (4, n, 16): [L0, R0, L1, R1] -> canonical limb rows (4, 16, n)
    K4 = jnp.stack([sL[0], sR[0], sL[1], sR[1]])
    K4 = jnp.transpose(K4, (0, 2, 1))
    lanes = _fold_lanes(n // 2)
    S = msm2._msm2_multi(mctx, n, lanes, FOLD_C_BITS, n // 2, xy_pack, K4,
                         stride=FOLD_STRIDE)
    return _chunk_sum_jit(dl), _chunk_sum_jit(dr), S


@partial(jax.jit, static_argnums=(0, 1))
def _fold_state_pair_jit(fctx, n: int, cs, zs, gw, h, xi_mont, xi_inv_mont):
    """Batched post-transcript state update for the open pair: (2, n, 16)
    stacks, per-open challenges xi_mont/xi_inv_mont of shape (2, 1, 16)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    mask = iota < h
    cs = jnp.where(mask, ff.add(fctx, cs, ff.mont_mul(
        fctx, jnp.roll(cs, -h, axis=-2), xi_inv_mont)), 0)
    zs = jnp.where(mask, ff.add(fctx, zs, ff.mont_mul(
        fctx, jnp.roll(zs, -h, axis=-2), xi_mont)), 0)
    bit = ((iota // jnp.maximum(h, 1)) & 1) == 1
    gw = jnp.where(bit, ff.mont_mul(fctx, gw, xi_mont), gw)
    return cs, zs, gw


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _u_msm_pair_jit(mctx: pk.MontCtx, fctx, n: int, c_bits: int, xy_pack, gw):
    K = jnp.transpose(ff.from_mont(fctx, gw), (0, 2, 1))  # (2, 16, n)
    lanes = _fold_lanes(n)
    return msm2._msm2_multi(mctx, n, lanes, c_bits, 0, xy_pack, K,
                            stride=FOLD_STRIDE)


@lru_cache(maxsize=32)
def _round_full_indices(n: int, k: int):
    """Full-length cs gather indices + L-support mask for round k: position
    i (rem = i mod 2h) belongs to L iff rem < h with cs index rem + h, and
    to R iff rem >= h with cs index rem - h (same algebra as
    _round_indices, uncompacted)."""
    h = n >> k
    i = np.arange(n, dtype=np.int64)
    rem = i % (2 * h)
    maskL = rem < h
    csiL = np.where(maskL, rem + h, 0).astype(np.int32)
    csiR = np.where(~maskL, rem - h, 0).astype(np.int32)
    return jnp.asarray(csiL), jnp.asarray(csiR), jnp.asarray(maskL)


@lru_cache(maxsize=32)
def _round_indices(n: int, k: int):
    """Host-precomputed gather indices for round k (1-based): compact
    enumeration of the bit_k=0 / bit_k=1 original-index supports and the
    cs positions feeding each (see module docstring)."""
    h = n >> k
    j = np.arange(n // 2, dtype=np.int32)
    a, r0 = j // h, j % h
    idxL = a * (2 * h) + r0
    idxR = idxL + np.int32(h)
    cspL = r0 + np.int32(h)
    cspR = r0
    pad = max(0, 16 - n // 2)  # min MSM width so windows*lanes >= BLK
    if pad:
        z = np.zeros(pad, dtype=np.int32)
        idxL, idxR = np.concatenate([idxL, z]), np.concatenate([idxR, z])
        cspL, cspR = np.concatenate([cspL, z]), np.concatenate([cspR, z])
    return tuple(jnp.asarray(x) for x in (idxL, idxR, cspL, cspR))


def _exact_sum(partial_sums, m: int) -> int:
    """(g, 16) u32-exact limb-column partials -> canonical int mod m."""
    cols = np.asarray(partial_sums, dtype=np.uint64).sum(axis=0, dtype=object)
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
    fctx = ff.ctx_for(m)
    mctx = pk.mont_ctx(cfg.p, cfg.b)
    pp = load_srs(cfg.name, max(4, n))
    transcript = Sponge(Protocols.PCDL, cfg)

    transcript.absorb_g([C])
    transcript.absorb_fr([z, v])
    xi_i = transcript.challenge()
    H_prime = ec_mul(cfg, pp.H, xi_i)

    if n == 1:  # lg(n) = 0: no fold rounds; U = G_0, c = p_0 (host version)
        return pcdl.EvalProof(Ls=[], Rs=[], U=pp.gs_ints(1)[0],
                              c=(p[0] % m if p else 0), C_bar=None, w_prime=None)

    xy_pack = msm2._srs_pack(cfg.name, n)
    cs = ff.to_mont_jit(fctx, jnp.asarray(
        ff.ints_to_array([c % m for c in p] + [0] * (n - len(p)))))
    zpows = [0] * n
    cur = 1
    for i in range(n):
        zpows[i] = cur
        cur = cur * z % m
    zs = ff.to_mont_jit(fctx, jnp.asarray(ff.ints_to_array(zpows)))
    gw = ff.mont_one(fctx, (n,))

    Ls: list[Affine] = []
    Rs: list[Affine] = []
    for k in range(1, lg_n + 1):
        h = n >> k
        idxL, idxR, cspL, cspR = _round_indices(n, k)
        # ONE host pull for the whole round: through the axon tunnel each
        # D2H transfer costs real latency, and per-array np.asarray pulls
        # (2 dot partials + 6 window tensors) made the loop round-trip-bound
        dl_part, dr_part, SL, SR = jax.device_get(_round_msms_jit(
            mctx, fctx, n, xy_pack, cs, zs, gw, jnp.int32(h),
            idxL, idxR, cspL, cspR))
        dot_l = _exact_sum(dl_part, m)
        dot_r = _exact_sum(dr_part, m)
        Lpt = msm2._combine_host(cfg, SL, FOLD_C_BITS)
        Rpt = msm2._combine_host(cfg, SR, FOLD_C_BITS)
        L = ec_add(cfg, Lpt, ec_mul(cfg, H_prime, dot_l))
        R = ec_add(cfg, Rpt, ec_mul(cfg, H_prime, dot_r))
        Ls.append(L)
        Rs.append(R)

        transcript.absorb_fr([xi_i])
        transcript.absorb_g([L, R])
        xi_next = transcript.challenge()
        xi_i = xi_next

        xi_dev = ff.to_mont_jit(fctx, jnp.asarray(ff.ints_to_array([xi_next])))[0]
        xi_inv_dev = ff.to_mont_jit(fctx, jnp.asarray(
            ff.ints_to_array([inv(xi_next, m)])))[0]
        cs, zs, gw = _fold_state_jit(fctx, n, cs, zs, gw, jnp.int32(h),
                                     xi_dev, xi_inv_dev)

    c_bits_u = msm2._choose_c(n)
    SU = _u_msm_jit(mctx, fctx, n, c_bits_u, xy_pack, gw)
    U = msm2._combine_host(cfg, SU, c_bits_u)
    c_final = ff.array_to_ints(np.asarray(ff.from_mont_jit(fctx, cs[:1])))[0]
    return pcdl.EvalProof(Ls=Ls, Rs=Rs, U=U, c=c_final, C_bar=None, w_prime=None)


def open_pair_without_eval_device(
    cfg: CurveCfg, opens: list, d: int
) -> list:
    """TWO non-hiding IPA opens folded in lockstep: each round's four half
    MSMs (L/R of both) run as one batched dispatch with one host pull.
    The PLONK prover's round 5 opens r at xi and r_omega at xi*omega —
    independent transcripts, identical shapes (reference protocol.rs
    round-5; pcdl.rs:404-438 is the per-open loop).

    opens: [(p_or_dev, C, z, v), (p_or_dev, C, z, v)] where p_or_dev is a
    host coefficient list OR a device-resident (n, 16) Montgomery coeff
    array (the device prover passes its r_dev arrays straight in).
    Returns the two EvalProofs, bit-identical to sequential opens."""
    from .. import pcdl
    from ..srs import load_srs

    assert len(opens) == 2
    n = d + 1
    lg_n = n.bit_length() - 1
    m = cfg.r
    fctx = ff.ctx_for(m)
    mctx = pk.mont_ctx(cfg.p, cfg.b)
    pp = load_srs(cfg.name, max(4, n))

    if n == 1:
        g0 = pp.gs_ints(1)[0]
        out = []
        for p, C, z, v in opens:
            c0 = (p[0] % m if len(p) else 0) if isinstance(p, list) else int(
                ff.limbs_to_int(np.asarray(ff.from_mont_jit(fctx, p[:1]))[0])) % m
            out.append(pcdl.EvalProof(Ls=[], Rs=[], U=g0, c=c0,
                                      C_bar=None, w_prime=None))
        return out

    xy_pack = msm2._srs_pack(cfg.name, n)

    transcripts = []
    xis = []
    H_primes = []
    cs_list = []
    zs_list = []
    for p, C, z, v in opens:
        t = Sponge(Protocols.PCDL, cfg)
        t.absorb_g([C])
        t.absorb_fr([z, v])
        xi0 = t.challenge()
        transcripts.append(t)
        xis.append(xi0)
        H_primes.append(ec_mul(cfg, pp.H, xi0))
        if isinstance(p, list):
            cs_i = ff.to_mont_jit(fctx, jnp.asarray(
                ff.ints_to_array([c % m for c in p] + [0] * (n - len(p)))))
        else:
            cs_i = p
            if cs_i.shape[0] != n:
                cs_i = jnp.concatenate(
                    [cs_i, jnp.zeros((n - cs_i.shape[0], NLIMBS), U32)])
        cs_list.append(cs_i)
        zpows = [0] * n
        cur = 1
        for i in range(n):
            zpows[i] = cur
            cur = cur * z % m
        zs_list.append(ff.to_mont_jit(fctx, jnp.asarray(ff.ints_to_array(zpows))))

    cs = jnp.stack(cs_list)
    zs = jnp.stack(zs_list)
    gw = ff.mont_one(fctx, (2, n))

    Ls = [[], []]
    Rs = [[], []]
    for k in range(1, lg_n + 1):
        h = n >> k
        csiL, csiR, maskL = _round_full_indices(n, k)
        dl_part, dr_part, S = jax.device_get(_round_msms_pair_jit(
            mctx, fctx, n, xy_pack, cs, zs, gw, jnp.int32(h), csiL, csiR, maskL))
        windows, _ = msm2._cfg_for_c(FOLD_C_BITS)
        xi_new = []
        for o in range(2):
            dot_l = _exact_sum(dl_part[o], m)
            dot_r = _exact_sum(dr_part[o], m)
            SL = tuple(c[:, (2 * o) * windows:(2 * o + 1) * windows] for c in S)
            SR = tuple(c[:, (2 * o + 1) * windows:(2 * o + 2) * windows] for c in S)
            Lpt = msm2._combine_host(cfg, SL, FOLD_C_BITS)
            Rpt = msm2._combine_host(cfg, SR, FOLD_C_BITS)
            L = ec_add(cfg, Lpt, ec_mul(cfg, H_primes[o], dot_l))
            R = ec_add(cfg, Rpt, ec_mul(cfg, H_primes[o], dot_r))
            Ls[o].append(L)
            Rs[o].append(R)
            t = transcripts[o]
            t.absorb_fr([xis[o]])
            t.absorb_g([L, R])
            xis[o] = t.challenge()
            xi_new.append(xis[o])

        xi_dev = ff.to_mont_jit(fctx, jnp.asarray(
            ff.ints_to_array(xi_new)))[:, None, :]
        xi_inv_dev = ff.to_mont_jit(fctx, jnp.asarray(
            ff.ints_to_array([inv(x, m) for x in xi_new])))[:, None, :]
        cs, zs, gw = _fold_state_pair_jit(fctx, n, cs, zs, gw, jnp.int32(h),
                                          xi_dev, xi_inv_dev)

    c_bits_u = msm2._choose_c(n)
    SU = jax.device_get(_u_msm_pair_jit(mctx, fctx, n, c_bits_u, xy_pack, gw))
    windows_u, _ = msm2._cfg_for_c(c_bits_u)
    cs_host = np.asarray(ff.from_mont_jit(fctx, cs[:, :1]))
    out = []
    for o in range(2):
        U = msm2._combine_host(
            cfg, tuple(c[:, o * windows_u:(o + 1) * windows_u] for c in SU),
            c_bits_u)
        c_final = ff.array_to_ints(cs_host[o])[0]
        out.append(pcdl.EvalProof(Ls=Ls[o], Rs=Rs[o], U=U, c=c_final,
                                  C_bar=None, w_prime=None))
    return out

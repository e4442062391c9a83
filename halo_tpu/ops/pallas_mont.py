"""Pallas TPU kernel library v2: lazy-domain Montgomery field/EC kernels.

Second-generation device kernels for the MSM/IPA hot path (the TPU-native
replacement for the arkworks field/EC kernels behind the reference's
crates/group/src/group.rs:40-66).  Design notes, from on-chip
microbenchmarks of the v1 kernels (ops/pallas_ff.py / ops/pallas_ec.py):

  * layout      (16, N) uint32 -- 16-bit little-endian limbs on the sublane
                axis, batch on the 128-wide lane axis.  No boundary
                transposes: msm2.py keeps data in this layout end-to-end.
  * lazy domain kernel values live in a "quasi-2p" domain [0, 2p + 2^131):
                REDC output < ab/R + p stays inside it for inputs inside it
                (p ~ 2^254 + 2^125, R = 2^256; strict [0,2p) is marginally
                NOT closed because 4p > R for Pasta).  Field add/sub do one
                conditional subtract of 2p.  Values are canonicalized once
                at the very end (`canon_rows`), never per-op.
  * carries     Kogge-Stone parallel-prefix across the limb sublanes
                (whole-tile ops) instead of 16-step serial chains: ~25
                Mosaic ops per propagation vs ~51 serialized (1, B) ops.
                Fewer ops keeps Mosaic compile times manageable for the
                fused EC kernels (v1's unrolled chains took ~290 s per
                kernel compile).
  * products   256 uint32 limb products on the VPU, split lo/hi-16 and
                column-summed by one-hot f32 contractions on the MXU
                (exact: entries < 2^16, <= 32 terms per column -> < 2^21).
  * REDC trick  the low-half carries of separated REDC collapse: one
                propagation of (T_lo + U_lo) columns delivers
                carry_t + carry_u + cross-carry in a single pass
                (T + U = 0 mod R).

Kernels: mm (Montgomery product), padd (complete projective add, RCB 2015
algorithm 7 for a=0), pmadd (complete mixed add, Z2=1 specialisation,
13 muls), pdbl (complete doubling, RCB algorithm 9).  Completeness: no
divergence; any lane may hold the identity (0:1:0), equal or opposite
points.  Mixed add requires the affine operand to be a genuine curve point
(never infinity) -- msm2.py guarantees that by construction.

Differential tests: tests/test_pallas_mont.py (interpret mode on CPU).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ff import MASK, NLIMBS, U32, int_to_limbs

BLK = 512  # lane-axis batch per grid step


def available() -> bool:
    return True


# ---------------- static one-hot contraction matrices ---------------- #


def _conv_matrices_rows():
    """(33, 512) / (16, 512) one-hot matrices (contraction on the right).

    Row layout of the flattened lo/hi product tensor: index h*256 + i*16 + j
    (h=0: low 16 bits -> column i+j; h=1: high 16 bits -> column i+j+1).
    """
    full = np.zeros((2 * NLIMBS + 1, 512), np.float32)
    low = np.zeros((NLIMBS, 512), np.float32)
    for h in range(2):
        for i in range(NLIMBS):
            for j in range(NLIMBS):
                k = i + j + h
                full[k, h * 256 + i * 16 + j] = 1.0
                if k < NLIMBS:
                    low[k, h * 256 + i * 16 + j] = 1.0
    return full, low


_CF, _CL = _conv_matrices_rows()


# ---------------- in-kernel primitives on (rows, B) tiles ---------------- #


def _shift_down(x, k):
    """Rows shifted down by k (row i reads old row i-k; top k rows zero)."""
    if k == 0:
        return x
    return jnp.concatenate([jnp.zeros((k, x.shape[1]), x.dtype), x[:-k]])


def _ks(cols, n_out):
    """Kogge-Stone carry resolution: redundant base-2^16 columns -> canonical
    16-bit limbs of value(cols) mod 2^(16*n_out).

    cols: (k, B) uint32 with entries < 2^22 (so the per-column carry fits
    6 bits).  Two phases: one carry-save compression, then a boolean
    carry-lookahead prefix.
    """
    k, B = cols.shape
    if k < n_out:
        cols = jnp.concatenate([cols, jnp.zeros((n_out - k, B), U32)])
    elif k > n_out:
        cols = cols[:n_out]
    s = cols & MASK
    g = cols >> 16  # < 2^6
    d = s + _shift_down(g, 1)  # <= 2^16 + 62
    s2 = d & MASK
    g2 = d >> 16  # in {0, 1}
    p2 = (s2 == MASK).astype(U32)
    gk, pk = g2, p2
    sh = 1
    while sh < n_out:
        gk = gk | (pk & _shift_down(gk, sh))
        pk = pk & _shift_down(pk, sh)
        sh *= 2
    return (s2 + _shift_down(gk, 1)) & MASK


def _sub_const(s, c_rows):
    """s - c via complement addition.  s: (k, B) canonical limbs; c_rows:
    (kc <= k, B) constant limbs.  Returns (diff (16, B), ge (1, B) bool):
    ge is the carry out of s + (~c) + 1, i.e. s >= c; diff is only valid
    (and only used) when the true difference fits 16 limbs."""
    k, B = s.shape
    kc = c_rows.shape[0]
    comp = jnp.asarray(MASK, U32) - c_rows  # (kc, B)
    if kc < k:
        comp = jnp.concatenate([comp, jnp.full((k - kc, B), MASK, U32)])
    one = jnp.concatenate([jnp.ones((1, B), U32), jnp.zeros((k - 1, B), U32)])
    res = _ks(s + comp + one, k + 1)
    ge = res[k][None] != 0  # carry out of the complement addition
    return res[:NLIMBS], ge


def _sub_const_if_ge(s, c_rows):
    """Subtract the constant c from s when s >= c; returns (16, B)."""
    d, ge = _sub_const(s, c_rows)
    return jnp.where(ge, d, s[:NLIMBS])


def _fadd(a, b, p2c):
    """(a + b) with one conditional subtract of 2p.  Inputs quasi-2p."""
    B = a.shape[1]
    cols = a + b  # <= 2^17 - 2 per limb
    s17 = _ks(cols, NLIMBS + 1)
    return _sub_const_if_ge(s17, p2c)


def _fsub(a, b, p4c, p2c):
    """(a - b + 4p) reduced below ~2p.  Inputs quasi-2p (possibly a bit
    above 2p, hence the 4p offset keeps the difference positive; the raw
    difference can reach ~6p > 2^256, so BOTH -2p and -4p candidates are
    formed and the smallest non-negative one selected -- output < 2p + eps,
    16 limbs)."""
    B = a.shape[1]
    comp = jnp.asarray(MASK, U32) - b  # 16-limb complement of b
    zrow = jnp.zeros((1, B), U32)
    cols = jnp.concatenate([a, zrow]) + p4c + jnp.concatenate([comp, zrow])
    one = jnp.concatenate([jnp.ones((1, B), U32), jnp.zeros((NLIMBS, B), U32)])
    s18 = _ks(cols + one, NLIMBS + 2)  # 18 limbs incl. the 2^256 offset
    s17 = jnp.concatenate([s18[:NLIMBS], (s18[NLIMBS] - 1)[None]])  # drop offset
    # two parallel conditional subtractions: pick s-4p if >=4p else s-2p if >=2p
    d2, ge2 = _sub_const(s17, p2c)
    d4, ge4 = _sub_const(s17, p4c)
    out = jnp.where(ge4, d4, jnp.where(ge2, d2, s17[:NLIMBS]))
    return out


def _conv_cmat(x, M, n_out16, n_bytes=2):
    """Constant-operand limb convolution ON THE MXU.

    x: (16, B) u32 16-bit limbs (quasi-2p value); M: (n_out8, 32) f32
    matrix for a fixed multiplicand c, M[k, r] = c8[k - w(r)] over 8-bit
    limb splits (rows 0..15 of x8 = lo bytes, weight 2^(16i); rows 16..31
    = hi bytes, weight 2^(16i+8)).  Every f32 MAC is exact: entries
    <= 255, inputs <= 255, column sums <= 32 * 255^2 < 2^21.  Returns
    (n_out16, B) u32 base-2^16 columns (< 2^30 — within _ks's carry
    budget).  Replaces the variable-operand conv (repeat + 256 VPU muls
    + 512-row split/cast) for the two REDC multiplies whose operand is a
    per-curve constant (-p^-1 mod R and p) and for small-constant muls
    (3b): those were ~2/3 of the kernel's VPU work (round-4 ablation:
    the scan is elementwise-op bound, not MXU/HBM bound)."""
    bs = [x & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF, x >> 24][:n_bytes]
    x8 = jnp.concatenate(bs).astype(jnp.int32).astype(jnp.float32)
    out8 = jax.lax.dot_general(
        M, x8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32).astype(U32)  # (n_out8, B), cols < 2^21
    n8 = out8.shape[0]
    pairs = out8.reshape(n8 // 2, 2, x.shape[1])
    cols = pairs[:, 0, :] + (pairs[:, 1, :] << 8)  # cols < 2^30
    if n_out16 > n8 // 2:  # e.g. the 33rd (2^512) column of a <2^510 product
        cols = jnp.concatenate(
            [cols, jnp.zeros((n_out16 - n8 // 2, x.shape[1]), U32)])
    return cols


def _redc_combine(T, Uc):
    """Final REDC step shared by _mm/_mm_c: (T + m*p) / R via one combined
    low-half carry.  T, Uc: (33, B) base-2^16 columns < 2^30."""
    lo_sum = T[:NLIMBS] + Uc[:NLIMBS]  # columns < 2^31
    carry = _ks(lo_sum, NLIMBS + 1)[NLIMBS]  # value(lo_sum) >> 256
    high = T[NLIMBS:] + Uc[NLIMBS:]
    high = jnp.concatenate([(high[0] + carry)[None], high[1:]])
    return _ks(high, NLIMBS)  # (T + U)/R < 2p + eps < 2^256


def _mm(a, b, cf, m_npr, m_p):
    """Montgomery product a*b*R^{-1} on (16, B) tiles, quasi-2p domain.

    Separated-operand REDC (same algorithm as ops/ff.py:mont_mul) without
    the final conditional subtraction.  Only the a*b convolution is
    variable-variable; the m = T*(-p^-1) mod R and m*p multiplies go
    through the constant-matrix MXU path (_conv_cmat)."""
    B = a.shape[1]

    def conv(x, y, mat, rows_out):
        rep_x = jnp.repeat(x, NLIMBS, axis=0)  # (256, B): row i*16+j = x_i
        rep_y = jnp.concatenate([y] * NLIMBS, axis=0)  # row i*16+j = y_j
        prod = rep_x * rep_y  # exact uint32
        flat = jnp.concatenate([prod & MASK, prod >> 16]).astype(jnp.int32).astype(jnp.float32)
        out = jax.lax.dot_general(
            mat, flat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[:rows_out].astype(jnp.int32).astype(U32)

    T = conv(a, b, cf, 2 * NLIMBS + 1)  # (33, B) columns < 2^21
    # the npr matrix takes T's REDUNDANT low columns directly (3-byte
    # split): value(T[:16] cols) == T (mod R), which is all m needs
    m = _ks(_conv_cmat(T[:NLIMBS], m_npr, NLIMBS, 3), NLIMBS)
    Uc = _conv_cmat(m, m_p, 2 * NLIMBS + 1)  # m*p columns
    return _redc_combine(T, Uc)


def _mm_c(x, m_c, m_npr4, m_p):
    """Montgomery product of a CONSTANT c (as matrix m_c) by x: all three
    REDC multiplies ride the MXU.  T's columns are < 2^30, so the npr
    stage uses the 4-byte split matrix."""
    T = _conv_cmat(x, m_c, 2 * NLIMBS + 1)
    m = _ks(_conv_cmat(T[:NLIMBS], m_npr4, NLIMBS, 4), NLIMBS)
    Uc = _conv_cmat(m, m_p, 2 * NLIMBS + 1)
    return _redc_combine(T, Uc)


# ---------------- kernels ---------------- #


def _mm_kernel(a_ref, b_ref, p_ref, p2_ref, p4_ref, cf_ref, mnpr_ref, mnpr4_ref, mp_ref, mb3_ref, o_ref):
    B = a_ref.shape[1]
    o_ref[:] = _mm(a_ref[:], b_ref[:], cf_ref[:], mnpr_ref[:], mp_ref[:])


def _padd_kernel(x1_r, y1_r, z1_r, x2_r, y2_r, z2_r,
                 p_ref, p2_ref, p4_ref, cf_ref, mnpr_ref, mnpr4_ref, mp_ref, mb3_ref,
                 x3_r, y3_r, z3_r):
    """Complete projective add, a=0 (RCB alg. 7) in the quasi-2p domain.
    Mirrors ops/ec.py:add (reference semantics: arkworks Projective +)."""
    B = x1_r.shape[1]
    pc = jnp.broadcast_to(p_ref[:], (NLIMBS, B))
    p2c = jnp.broadcast_to(p2_ref[:], (NLIMBS, B))
    p4c = jnp.broadcast_to(p4_ref[:], (NLIMBS + 1, B))
    cf = cf_ref[:]
    mnpr, mnpr4, mp, mb3 = mnpr_ref[:], mnpr4_ref[:], mp_ref[:], mb3_ref[:]

    def mm(a, b):
        return _mm(a, b, cf, mnpr, mp)

    def mm_b3(x):
        return _mm_c(x, mb3, mnpr4, mp)

    def fadd(a, b):
        return _fadd(a, b, p2c)

    def fsub(a, b):
        return _fsub(a, b, p4c, p2c)

    X1, Y1, Z1 = x1_r[:], y1_r[:], z1_r[:]
    X2, Y2, Z2 = x2_r[:], y2_r[:], z2_r[:]

    t0 = mm(X1, X2)
    t1 = mm(Y1, Y2)
    t2 = mm(Z1, Z2)
    t3 = fsub(mm(fadd(X1, Y1), fadd(X2, Y2)), fadd(t0, t1))
    t4 = fsub(mm(fadd(Y1, Z1), fadd(Y2, Z2)), fadd(t1, t2))
    Y3 = fsub(mm(fadd(X1, Z1), fadd(X2, Z2)), fadd(t0, t2))
    t0 = fadd(fadd(t0, t0), t0)
    t2 = mm_b3(t2)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    Y3 = mm_b3(Y3)
    X3 = fsub(mm(t3, t1), mm(t4, Y3))
    Y3n = fadd(mm(t1, Z3), mm(Y3, t0))
    Z3n = fadd(mm(Z3, t4), mm(t0, t3))

    x3_r[:] = X3
    y3_r[:] = Y3n
    z3_r[:] = Z3n


def _pmadd_kernel(x1_r, y1_r, z1_r, x2_r, y2_r,
                  p_ref, p2_ref, p4_ref, cf_ref, mnpr_ref, mnpr4_ref, mp_ref, mb3_ref,
                  x3_r, y3_r, z3_r):
    """Complete mixed add (Z2 = 1), 13 muls: alg. 7 with the Z2=1
    simplifications t2 = Z1, t4 = Y1 + Z1*y2, Y3tmp = X1 + Z1*x2.
    The affine operand must be a genuine curve point (not infinity)."""
    B = x1_r.shape[1]
    pc = jnp.broadcast_to(p_ref[:], (NLIMBS, B))
    p2c = jnp.broadcast_to(p2_ref[:], (NLIMBS, B))
    p4c = jnp.broadcast_to(p4_ref[:], (NLIMBS + 1, B))
    cf = cf_ref[:]
    mnpr, mnpr4, mp, mb3 = mnpr_ref[:], mnpr4_ref[:], mp_ref[:], mb3_ref[:]

    def mm(a, b):
        return _mm(a, b, cf, mnpr, mp)

    def mm_b3(x):
        return _mm_c(x, mb3, mnpr4, mp)

    def fadd(a, b):
        return _fadd(a, b, p2c)

    def fsub(a, b):
        return _fsub(a, b, p4c, p2c)

    X1, Y1, Z1 = x1_r[:], y1_r[:], z1_r[:]
    x2, y2 = x2_r[:], y2_r[:]

    t0 = mm(X1, x2)
    t1 = mm(Y1, y2)
    t3 = fsub(mm(fadd(X1, Y1), fadd(x2, y2)), fadd(t0, t1))
    t4 = fadd(Y1, mm(Z1, y2))
    t5 = fadd(X1, mm(Z1, x2))  # alg-7 "Y3" pre-b3
    t0 = fadd(fadd(t0, t0), t0)
    t2 = mm_b3(Z1)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    t5 = mm_b3(t5)
    X3 = fsub(mm(t3, t1), mm(t4, t5))
    Y3 = fadd(mm(t1, Z3), mm(t5, t0))
    Z3n = fadd(mm(Z3, t4), mm(t0, t3))

    x3_r[:] = X3
    y3_r[:] = Y3
    z3_r[:] = Z3n


def _pmadd_pack_kernel(x1_r, y1_r, z1_r, pack_r, sign_r,
                       p_ref, p2_ref, p4_ref, cf_ref, mnpr_ref, mnpr4_ref, mp_ref, mb3_ref,
                       x3_r, y3_r, z3_r):
    """Mixed add with a packed affine operand: pack rows hold
    x_limb | (y_limb << 16) (canonical Montgomery limbs), sign (1, B)
    nonzero means add the NEGATED point (y -> p - y).  This is the MSM
    bucket-scan body (one sorted point folded into the running prefix)."""
    B = x1_r.shape[1]
    pc = jnp.broadcast_to(p_ref[:], (NLIMBS, B))
    p2c = jnp.broadcast_to(p2_ref[:], (NLIMBS, B))
    p4c = jnp.broadcast_to(p4_ref[:], (NLIMBS + 1, B))
    cf = cf_ref[:]
    mnpr, mnpr4, mp, mb3 = mnpr_ref[:], mnpr4_ref[:], mp_ref[:], mb3_ref[:]

    pack = pack_r[:]
    x2 = pack & MASK
    y0 = pack >> 16
    # p - y0 via complement add (y0 in (0, p): prime-order curve, no y=0)
    one = jnp.concatenate([jnp.ones((1, B), U32), jnp.zeros((NLIMBS - 1, B), U32)])
    py = _ks(pc + (jnp.asarray(MASK, U32) - y0) + one, NLIMBS)
    y2 = jnp.where(sign_r[:] != 0, py, y0)

    def mm(a, b):
        return _mm(a, b, cf, mnpr, mp)

    def mm_b3(x):
        return _mm_c(x, mb3, mnpr4, mp)

    def fadd(a, b):
        return _fadd(a, b, p2c)

    def fsub(a, b):
        return _fsub(a, b, p4c, p2c)

    X1, Y1, Z1 = x1_r[:], y1_r[:], z1_r[:]

    t0 = mm(X1, x2)
    t1 = mm(Y1, y2)
    t3 = fsub(mm(fadd(X1, Y1), fadd(x2, y2)), fadd(t0, t1))
    t4 = fadd(Y1, mm(Z1, y2))
    t5 = fadd(X1, mm(Z1, x2))
    t0 = fadd(fadd(t0, t0), t0)
    t2 = mm_b3(Z1)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    t5 = mm_b3(t5)
    X3 = fsub(mm(t3, t1), mm(t4, t5))
    Y3 = fadd(mm(t1, Z3), mm(t5, t0))
    Z3n = fadd(mm(Z3, t4), mm(t0, t3))

    x3_r[:] = X3
    y3_r[:] = Y3
    z3_r[:] = Z3n


def _pdbl_kernel(x_r, y_r, z_r,
                 p_ref, p2_ref, p4_ref, cf_ref, mnpr_ref, mnpr4_ref, mp_ref, mb3_ref,
                 x3_r, y3_r, z3_r):
    """Complete doubling, a=0 (RCB alg. 9); mirrors ops/ec.py:double."""
    B = x_r.shape[1]
    pc = jnp.broadcast_to(p_ref[:], (NLIMBS, B))
    p2c = jnp.broadcast_to(p2_ref[:], (NLIMBS, B))
    p4c = jnp.broadcast_to(p4_ref[:], (NLIMBS + 1, B))
    cf = cf_ref[:]
    mnpr, mnpr4, mp, mb3 = mnpr_ref[:], mnpr4_ref[:], mp_ref[:], mb3_ref[:]

    def mm(a, b):
        return _mm(a, b, cf, mnpr, mp)

    def mm_b3(x):
        return _mm_c(x, mb3, mnpr4, mp)

    def fadd(a, b):
        return _fadd(a, b, p2c)

    def fsub(a, b):
        return _fsub(a, b, p4c, p2c)

    X, Y, Z = x_r[:], y_r[:], z_r[:]

    t0 = mm(Y, Y)
    Z3 = fadd(t0, t0)
    Z3 = fadd(Z3, Z3)
    Z3 = fadd(Z3, Z3)
    t1 = mm(Y, Z)
    t2 = mm(Z, Z)
    t2 = mm_b3(t2)
    X3 = mm(t2, Z3)
    Y3 = fadd(t0, t2)
    Z3 = mm(t1, Z3)
    t1 = fadd(t2, t2)
    t2 = fadd(t1, t2)
    t0 = fsub(t0, t2)
    Y3 = mm(t0, Y3)
    Y3 = fadd(X3, Y3)
    t1 = mm(X, Y)
    X3 = mm(t0, t1)
    X3 = fadd(X3, X3)

    x3_r[:] = X3
    y3_r[:] = Y3
    z3_r[:] = Z3


def _bfly_kernel(e_ref, o_ref, t_ref,
                 p_ref, p2_ref, p4_ref, cf_ref, mnpr_ref, mnpr4_ref, mp_ref, mb3_ref,
                 e3_r, o3_r):
    """Radix-2 NTT butterfly: (e, o, w) -> (e + w*o, e - w*o), quasi-2p
    domain (one canon pass at the end of the transform, never per stage).
    The NTT hot op (reference: ark-poly Radix2EvaluationDomain FFT behind
    crates/group/src/poly.rs:11)."""
    B = e_ref.shape[1]
    p2c = jnp.broadcast_to(p2_ref[:], (NLIMBS, B))
    p4c = jnp.broadcast_to(p4_ref[:], (NLIMBS + 1, B))
    t = _mm(o_ref[:], t_ref[:], cf_ref[:], mnpr_ref[:], mp_ref[:])
    e3_r[:] = _fadd(e_ref[:], t, p2c)
    o3_r[:] = _fsub(e_ref[:], t, p4c, p2c)


def _mulc_kernel(a_ref, c_ref,
                 p_ref, p2_ref, p4_ref, cf_ref, mnpr_ref, mnpr4_ref, mp_ref, mb3_ref,
                 o_ref):
    """a * c (both (16, B); c typically a broadcast constant row)."""
    B = a_ref.shape[1]
    o_ref[:] = _mm(a_ref[:], c_ref[:], cf_ref[:], mnpr_ref[:], mp_ref[:])


def _canon_kernel(a_ref,
                  p_ref, p2_ref, p4_ref, cf_ref, mnpr_ref, mnpr4_ref, mp_ref, mb3_ref,
                  o_ref):
    """Quasi-2p -> canonical [0, p): conditional subtract of 2p then p."""
    B = a_ref.shape[1]
    pc = jnp.broadcast_to(p_ref[:], (NLIMBS, B))
    p2c = jnp.broadcast_to(p2_ref[:], (NLIMBS, B))
    s = _sub_const_if_ge(a_ref[:], p2c)
    o_ref[:] = _sub_const_if_ge(s, pc)


_KERNELS = {
    # kind -> (kernel, input row counts, output count)
    "mm": (_mm_kernel, (NLIMBS, NLIMBS), 1),
    "padd": (_padd_kernel, (NLIMBS,) * 6, 3),
    "pmadd": (_pmadd_kernel, (NLIMBS,) * 5, 3),
    "pmadd_pack": (_pmadd_pack_kernel, (NLIMBS, NLIMBS, NLIMBS, NLIMBS, 1), 3),
    "pdbl": (_pdbl_kernel, (NLIMBS,) * 3, 3),
    "bfly": (_bfly_kernel, (NLIMBS,) * 3, 2),
    "mulc": (_mulc_kernel, (NLIMBS,) * 2, 1),
    "canon": (_canon_kernel, (NLIMBS,), 1),
}


# ---------------- jnp fallback tier (CPU meshes) ---------------- #
#
# Opt-in (HALO_TPU_ROWS_JNP=1, CPU backend only) replacements for the
# kernels above, built on the v1 jnp field tier (ops/ff.py): the SAME
# RCB-2015 complete-addition formulas in the same operation order, but with
# canonical [0, p) representatives (a subset of the quasi-2p domain), so
# every output is congruent mod p and the projective points are the same
# group elements — affine results and proof bytes are identical.
#
# Why it exists: interpret-mode Pallas turns each kernel body into a huge
# XLA:CPU subgraph; one sharded-MSM executable costs minutes of compile on
# a small-host CPU mesh (and the persistent cache re-codegens on load, so
# it never amortizes).  The multi-chip DRYRUN uses this tier to validate
# the production v2 pipeline + collectives in seconds; interpret-mode
# kernel validation stays with tests/test_pallas_mont.py and the slow
# tests in tests/test_parallel.py.


def rows_jnp_enabled() -> bool:
    import os

    return _is_cpu() and os.environ.get("HALO_TPU_ROWS_JNP") == "1"


@lru_cache(maxsize=8)
def _j_field(p: int):
    from . import ff as _ff

    return _ff.ctx_for(p)


def _j_helpers(ctx: MontCtx):
    from . import ff as _ff

    f = _j_field(ctx.p)
    b3 = jnp.asarray(ctx.b3_rows[:, 0][None])  # (1, 16): Mont form of 3b

    def mm(a, b):
        return _ff.mont_mul(f, a, b)

    def fadd(a, b):
        return _ff.add(f, a, b)

    def fsub(a, b):
        return _ff.sub(f, a, b)

    def mm_b3(x):
        return _ff.mont_mul(f, x, b3)

    return f, mm, fadd, fsub, mm_b3


def _j_pmadd_core(ctx: MontCtx, X1, Y1, Z1, x2, y2):
    """Mixed add on (N, 16) canonical-Montgomery limbs (mirrors
    _pmadd_kernel op for op)."""
    _, mm, fadd, fsub, mm_b3 = _j_helpers(ctx)
    t0 = mm(X1, x2)
    t1 = mm(Y1, y2)
    t3 = fsub(mm(fadd(X1, Y1), fadd(x2, y2)), fadd(t0, t1))
    t4 = fadd(Y1, mm(Z1, y2))
    t5 = fadd(X1, mm(Z1, x2))
    t0 = fadd(fadd(t0, t0), t0)
    t2 = mm_b3(Z1)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    t5 = mm_b3(t5)
    X3 = fsub(mm(t3, t1), mm(t4, t5))
    Y3 = fadd(mm(t1, Z3), mm(t5, t0))
    Z3n = fadd(mm(Z3, t4), mm(t0, t3))
    return X3, Y3, Z3n


def _j_padd_core(ctx: MontCtx, X1, Y1, Z1, X2, Y2, Z2):
    """Complete projective add (mirrors _padd_kernel)."""
    _, mm, fadd, fsub, mm_b3 = _j_helpers(ctx)
    t0 = mm(X1, X2)
    t1 = mm(Y1, Y2)
    t2 = mm(Z1, Z2)
    t3 = fsub(mm(fadd(X1, Y1), fadd(X2, Y2)), fadd(t0, t1))
    t4 = fsub(mm(fadd(Y1, Z1), fadd(Y2, Z2)), fadd(t1, t2))
    Y3 = fsub(mm(fadd(X1, Z1), fadd(X2, Z2)), fadd(t0, t2))
    t0 = fadd(fadd(t0, t0), t0)
    t2 = mm_b3(t2)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    Y3 = mm_b3(Y3)
    X3 = fsub(mm(t3, t1), mm(t4, Y3))
    Y3n = fadd(mm(t1, Z3), mm(Y3, t0))
    Z3n = fadd(mm(Z3, t4), mm(t0, t3))
    return X3, Y3n, Z3n


def _j_pdbl_core(ctx: MontCtx, X, Y, Z):
    """Complete doubling (mirrors _pdbl_kernel)."""
    _, mm, fadd, fsub, mm_b3 = _j_helpers(ctx)
    t0 = mm(Y, Y)
    Z3 = fadd(t0, t0)
    Z3 = fadd(Z3, Z3)
    Z3 = fadd(Z3, Z3)
    t1 = mm(Y, Z)
    t2 = mm(Z, Z)
    t2 = mm_b3(t2)
    X3 = mm(t2, Z3)
    Y3 = fadd(t0, t2)
    Z3 = mm(t1, Z3)
    t1 = fadd(t2, t2)
    t2 = fadd(t1, t2)
    t0 = fsub(t0, t2)
    Y3 = mm(t0, Y3)
    Y3 = fadd(X3, Y3)
    t1 = mm(X, Y)
    X3 = mm(t0, t1)
    X3 = fadd(X3, X3)
    return X3, Y3, Z3


def _t(x):
    return jnp.transpose(x)


def _j_canon(ctx: MontCtx, a):
    """Fallback values are canonical by construction; reduce defensively in
    case an input was produced in the quasi-2p domain (e.g. mixed tiers)."""
    from . import ff as _ff

    at = _t(a)
    p2 = int_to_limbs(2 * ctx.p) if 2 * ctx.p < (1 << 256) else None
    if p2 is not None:
        at = _ff._sub_if_ge(at, jnp.asarray(p2))
    at = _ff._sub_if_ge(at, jnp.asarray(int_to_limbs(ctx.p)))
    return _t(at)


def _j_run(ctx: MontCtx, kind: str, arrays) -> tuple:
    from . import ff as _ff

    f = _j_field(ctx.p)
    if kind == "mm" or kind == "mulc":
        a, b = arrays
        return _t(_ff.mont_mul(f, _t(a), _t(b)))
    if kind == "canon":
        return _j_canon(ctx, arrays[0])
    if kind == "bfly":
        e, o, tw = (_t(x) for x in arrays)
        t = _ff.mont_mul(f, o, tw)
        return _t(_ff.add(f, e, t)), _t(_ff.sub(f, e, t))
    if kind == "padd":
        out = _j_padd_core(ctx, *(_t(x) for x in arrays))
        return tuple(_t(c) for c in out)
    if kind == "pmadd":
        out = _j_pmadd_core(ctx, *(_t(x) for x in arrays))
        return tuple(_t(c) for c in out)
    if kind == "pdbl":
        out = _j_pdbl_core(ctx, *(_t(x) for x in arrays))
        return tuple(_t(c) for c in out)
    if kind == "pmadd_pack":
        X1, Y1, Z1, pack, sign = arrays
        x2 = pack & MASK
        y0 = pack >> 16
        py = _t(_ff.neg(f, _t(y0)))  # y != 0 on a prime-order curve
        y2 = jnp.where(sign != 0, py, y0)
        out = _j_pmadd_core(ctx, _t(X1), _t(Y1), _t(Z1), _t(x2), _t(y2))
        return tuple(_t(c) for c in out)
    raise ValueError(f"unknown kernel kind {kind!r}")


# ---------------- host-facing wrappers ---------------- #


def _cmat(c_int: int, n_out8: int, n_bytes: int = 2) -> np.ndarray:
    """(n_out8, 16*n_bytes) f32 constant-convolution matrix for
    _conv_cmat: input row b*16+i carries byte b of limb i, weight
    2^(16i+8b)."""
    c8 = [(c_int >> (8 * s)) & 0xFF for s in range(n_out8)]
    M = np.zeros((n_out8, n_bytes * NLIMBS), np.float32)
    for r in range(n_bytes * NLIMBS):
        w = 2 * (r % NLIMBS) + (r // NLIMBS)
        for k in range(n_out8):
            s = k - w
            if 0 <= s < n_out8 and c8[s]:
                M[k, r] = float(c8[s])
    return np.ascontiguousarray(M)


class MontCtx:
    """Per-curve constants for the v2 kernels (hashable static arg)."""

    def __init__(self, p: int, b: int):
        self.p = p
        self.b = b
        self.p_rows = np.ascontiguousarray(int_to_limbs(p)[:, None].astype(np.uint32))
        self.p2_rows = np.ascontiguousarray(int_to_limbs(2 * p)[:, None].astype(np.uint32))
        p4 = np.frombuffer(int(4 * p).to_bytes(34, "little"), dtype="<u2").astype(np.uint32)
        self.p4_rows = np.ascontiguousarray(p4[:17, None])
        npr_int = pow(p, -1, 1 << 256) * -1 % (1 << 256)
        b3_int = 3 * b * (1 << 256) % p
        self.npr_rows = np.ascontiguousarray(
            int_to_limbs(npr_int)[:, None].astype(np.uint32))
        self.b3_rows = np.ascontiguousarray(
            int_to_limbs(b3_int)[:, None].astype(np.uint32))
        # constant-operand convolution matrices for the MXU REDC path
        # (_conv_cmat): M[k, r] = c8[k - w(r)], w(r) the base-2^8 weight of
        # input row r (rows 0..15 lo bytes, 16..31 hi bytes)
        self.m_npr = _cmat(npr_int, 32, 3)   # T_lo(redundant) * npr, low half
        self.m_npr4 = _cmat(npr_int, 32, 4)  # same, 4-byte split (mm_c)
        self.m_p = _cmat(p, 64)              # m * p, full product
        self.m_b3 = _cmat(b3_int, 64)        # 3b * x, full product

    def __hash__(self):
        return hash((self.p, self.b))

    def __eq__(self, other):
        return isinstance(other, MontCtx) and (self.p, self.b) == (other.p, other.b)


@lru_cache(maxsize=8)
def mont_ctx(p: int, b: int) -> MontCtx:
    return MontCtx(p, b)


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


@lru_cache(maxsize=64)
def _build_call(ctx: MontCtx, kind: str, n: int, interpret: bool):
    kernel, in_rows, n_out = _KERNELS[kind]
    grid = n // BLK

    def blk(rows=NLIMBS):
        return pl.BlockSpec((rows, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[blk(r) for r in in_rows]
        + [whole((NLIMBS, 1)), whole((NLIMBS, 1)), whole((NLIMBS + 1, 1))]
        + [whole(_CF.shape), whole((32, 48)), whole((32, 64)),
           whole((64, 32)), whole((64, 32))],
        out_specs=[blk() for _ in range(n_out)] if n_out > 1 else blk(),
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, n), U32) for _ in range(n_out)]
        if n_out > 1 else jax.ShapeDtypeStruct((NLIMBS, n), U32),
        interpret=interpret,
    )
    consts = (ctx.p_rows, ctx.p2_rows, ctx.p4_rows,
              np.ascontiguousarray(_CF), ctx.m_npr, ctx.m_npr4,
              ctx.m_p, ctx.m_b3)

    def fn(*data):
        return call(*data, *consts)

    return fn


def _run(ctx: MontCtx, kind: str, arrays) -> tuple:
    """arrays: tuple of (16, N) uint32; N padded to BLK multiple by caller."""
    n = arrays[0].shape[1]
    assert n % BLK == 0, n
    if rows_jnp_enabled():
        return _j_run(ctx, kind, arrays)
    return _build_call(ctx, kind, n, _is_cpu())(*arrays)


def mm_rows(ctx: MontCtx, a, b):
    """Batched Montgomery product on (16, N) arrays (quasi-2p domain)."""
    return _run(ctx, "mm", (a, b))


def padd_rows(ctx: MontCtx, P, Q):
    """Complete projective add; P, Q tuples of 3 (16, N) arrays."""
    return tuple(_run(ctx, "padd", (*P, *Q)))


def pmadd_rows(ctx: MontCtx, P, A):
    """Complete mixed add; P = (X, Y, Z), A = (x, y) affine, never infinity."""
    return tuple(_run(ctx, "pmadd", (*P, *A)))


def pdbl_rows(ctx: MontCtx, P):
    """Complete doubling of P = (X, Y, Z)."""
    return tuple(_run(ctx, "pdbl", tuple(P)))


def pmadd_pack_rows(ctx: MontCtx, P, pack, sign):
    """Mixed add with packed affine operand; P = (X, Y, Z) (16, N) arrays,
    pack (16, N) = x | (y << 16), sign (1, N) nonzero -> add -point."""
    return tuple(_run(ctx, "pmadd_pack", (*P, pack, sign)))


def bfly_rows(ctx: MontCtx, even, odd, tw):
    """NTT butterfly on (16, N) arrays -> (even + tw*odd, even - tw*odd)."""
    return tuple(_run(ctx, "bfly", (even, odd, tw)))


def mulc_rows(ctx: MontCtx, a, c):
    """Montgomery product (quasi-2p); c broadcastable (16, N) rows."""
    return _run(ctx, "mulc", (a, jnp.broadcast_to(c, a.shape)))


def canon_rows(ctx: MontCtx, a):
    """Canonicalize quasi-2p rows to [0, p)."""
    return _run(ctx, "canon", (a,))

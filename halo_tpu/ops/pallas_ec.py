"""Pallas TPU kernels: fused complete EC point add / double.

The jnp `ec.add` (Renes-Costello-Batina alg. 7, halo_tpu/ops/ec.py:98)
lowers to ~14 separate mont_mul graphs, each round-tripping its (N,512)
f32 conv intermediates through HBM — at MSM production batches that is
~1 GB of HBM traffic per bucket-scan step and the whole Pippenger is
bandwidth/latency-bound.  These kernels fuse the ENTIRE formula per
row-block in VMEM:

  layout    (16, N) uint32 — limbs on sublanes, batch on the lane axis
            (wrappers transpose at the boundary)
  mont mul  same fused REDC pipeline as ops/pallas_ff.py (one (256,B)
            uint32 VPU multiply, lo/hi (512,B) f32 MXU contraction
            against the static one-hot matrices, unrolled carry chains)
  add/sub   field add/sub as 16-step carry/borrow chains + conditional
            subtract, all on (B,) rows in VMEM
  traffic   read 6 coords + write 3 coords = 9*(64*N) bytes total,
            vs ~14 muls * ~5 intermediates * 2 KB/element via XLA.

This is the MSM/IPA hot path (SURVEY.md §2.1 "point_dot" row: the single
hottest kernel; reference arkworks Projective add via rayon,
crates/group/src/group.rs:48-56).  Differential tests:
tests/test_pallas_ec.py (interpret mode on CPU).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ff import MASK, NLIMBS, U32, int_to_limbs, _CONV_FULL, _CONV_LOW
from .pallas_ff import _carry16_rows, _consts, _limb_conv_rows

BLK = 512  # lane-axis rows per grid step


def available() -> bool:
    return True


# ---------------- in-kernel field primitives on (16, B) tiles ---------------- #


def _cond_sub_p(res, pc):
    """res (17, B) < 2p -> canonical (16, B): subtract p unless it borrows."""
    B = res.shape[1]
    d = res.astype(jnp.int32) - jnp.pad(pc, ((0, 1), (0, 0))).astype(jnp.int32)
    outs = []
    borrow = jnp.zeros((B,), jnp.int32)
    for i in range(NLIMBS + 1):
        v = d[i] + borrow
        outs.append(v & MASK)
        borrow = v >> 16  # arithmetic shift: -1 while borrowing
    diff = jnp.stack(outs).astype(U32)
    ge = (borrow == 0)[None, :]
    return jnp.where(ge, diff, res)[:NLIMBS]


def _fadd(a, b, pc):
    """(a + b) mod p for canonical (16, B) operands."""
    cols = a + b  # < 2^17 per limb
    low, carry = _carry16_rows(cols)
    res = jnp.concatenate([low, carry[None]])
    return _cond_sub_p(res, pc)


def _fsub(a, b, pc):
    """(a - b) mod p via a + p - b (non-negative), then conditional subtract."""
    B = a.shape[1]
    d = a.astype(jnp.int32) + pc.astype(jnp.int32) - b.astype(jnp.int32)
    outs = []
    carry = jnp.zeros((B,), jnp.int32)
    for i in range(NLIMBS):
        v = d[i] + carry
        outs.append(v & MASK)
        carry = v >> 16
    res = jnp.concatenate([jnp.stack(outs), carry[None]]).astype(U32)
    return _cond_sub_p(res, pc)


def _mm(a, b, pc, npr, cf, cl):
    """Fused Montgomery product on (16, B) tiles (ops/pallas_ff.py pipeline)."""
    B = a.shape[1]
    T = _limb_conv_rows(a, b, cf)  # (33, B)
    t_low, carry_t = _carry16_rows(T[:NLIMBS])
    m_cols = _limb_conv_rows(t_low, jnp.broadcast_to(npr, (NLIMBS, B)), cl)
    m, _ = _carry16_rows(m_cols)
    Uc = _limb_conv_rows(m, jnp.broadcast_to(pc, (NLIMBS, B)), cf)
    u_low, carry_u = _carry16_rows(Uc[:NLIMBS])
    _, carry_lo = _carry16_rows(t_low + u_low)
    high = T[NLIMBS:] + Uc[NLIMBS:]  # (17, B)
    high = jnp.concatenate([(high[0] + carry_t + carry_u + carry_lo)[None], high[1:]])
    outs = []
    carry = jnp.zeros((B,), U32)
    for i in range(NLIMBS + 1):
        v = high[i] + carry
        outs.append(v & MASK)
        carry = v >> 16
    return _cond_sub_p(jnp.stack(outs), pc)


# ---------------- kernels ---------------- #


def _ec_add_kernel(x1_r, y1_r, z1_r, x2_r, y2_r, z2_r, p_r, npr_r, b3_r, cf_r, cl_r,
                   x3_r, y3_r, z3_r):
    """Complete addition, a=0 (RCB alg. 7) — mirrors ops/ec.py:add."""
    pc = p_r[:]
    npr = npr_r[:]
    cf = cf_r[:]
    cl = cl_r[:]
    B = x1_r.shape[1]
    b3 = jnp.broadcast_to(b3_r[:], (NLIMBS, B))

    X1, Y1, Z1 = x1_r[:], y1_r[:], z1_r[:]
    X2, Y2, Z2 = x2_r[:], y2_r[:], z2_r[:]

    def mm(a, b):
        return _mm(a, b, pc, npr, cf, cl)

    t0 = mm(X1, X2)
    t1 = mm(Y1, Y2)
    t2 = mm(Z1, Z2)
    t3 = mm(_fadd(X1, Y1, pc), _fadd(X2, Y2, pc))
    t3 = _fsub(t3, _fadd(t0, t1, pc), pc)
    t4 = mm(_fadd(Y1, Z1, pc), _fadd(Y2, Z2, pc))
    t4 = _fsub(t4, _fadd(t1, t2, pc), pc)
    X3 = mm(_fadd(X1, Z1, pc), _fadd(X2, Z2, pc))
    Y3 = _fsub(X3, _fadd(t0, t2, pc), pc)
    t0 = _fadd(_fadd(t0, t0, pc), t0, pc)
    t2 = mm(b3, t2)
    Z3 = _fadd(t1, t2, pc)
    t1 = _fsub(t1, t2, pc)
    Y3 = mm(b3, Y3)
    X3 = _fsub(mm(t3, t1), mm(t4, Y3), pc)
    Y3 = _fadd(mm(t1, Z3), mm(Y3, t0), pc)
    Z3 = _fadd(mm(Z3, t4), mm(t0, t3), pc)

    x3_r[:] = X3
    y3_r[:] = Y3
    z3_r[:] = Z3


def _ec_double_kernel(x_r, y_r, z_r, p_r, npr_r, b3_r, cf_r, cl_r, x3_r, y3_r, z3_r):
    """Complete doubling, a=0 (RCB alg. 9) — mirrors ops/ec.py:double."""
    pc = p_r[:]
    npr = npr_r[:]
    cf = cf_r[:]
    cl = cl_r[:]
    B = x_r.shape[1]
    b3 = jnp.broadcast_to(b3_r[:], (NLIMBS, B))

    X, Y, Z = x_r[:], y_r[:], z_r[:]

    def mm(a, b):
        return _mm(a, b, pc, npr, cf, cl)

    t0 = mm(Y, Y)
    Z3 = _fadd(t0, t0, pc)
    Z3 = _fadd(Z3, Z3, pc)
    Z3 = _fadd(Z3, Z3, pc)
    t1 = mm(Y, Z)
    t2 = mm(Z, Z)
    t2 = mm(b3, t2)
    X3 = mm(t2, Z3)
    Y3 = _fadd(t0, t2, pc)
    Z3 = mm(t1, Z3)
    t1 = _fadd(t2, t2, pc)
    t2 = _fadd(t1, t2, pc)
    t0 = _fsub(t0, t2, pc)
    Y3 = mm(t0, Y3)
    Y3 = _fadd(X3, Y3, pc)
    t1 = mm(X, Y)
    X3 = mm(t0, t1)
    X3 = _fadd(X3, X3, pc)

    x3_r[:] = X3
    y3_r[:] = Y3
    z3_r[:] = Z3


# ---------------- host-facing wrappers ---------------- #


def _curve_consts(ctx_ec):
    base = ctx_ec.base
    p, nprime = _consts(base)
    b3 = int_to_limbs(3 * ctx_ec.b * (1 << 256) % ctx_ec.p).astype(np.uint32)
    return p, nprime, b3


@lru_cache(maxsize=16)
def _ec_fn(ctx_ec, n_pad: int, kind: str, interpret: bool):
    p, nprime, b3 = _curve_consts(ctx_ec)
    grid = n_pad // BLK
    n_in = 6 if kind == "add" else 3
    kernel = _ec_add_kernel if kind == "add" else _ec_double_kernel

    def blk_spec():
        return pl.BlockSpec((NLIMBS, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[blk_spec() for _ in range(n_in)]
        + [
            whole((NLIMBS, 1)),
            whole((NLIMBS, 1)),
            whole((NLIMBS, 1)),
            whole(_CONV_FULL.T.shape),
            whole(_CONV_LOW.T.shape),
        ],
        out_specs=[blk_spec() for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, n_pad), U32) for _ in range(3)],
        interpret=interpret,
    )
    # keep as NUMPY: the cached closure is reused across unrelated jit
    # traces, and a jnp.asarray created while tracing would leak that
    # trace's tracer into later ones
    consts = (
        np.ascontiguousarray(p[:, None]),
        np.ascontiguousarray(nprime[:, None]),
        np.ascontiguousarray(b3[:, None]),
        np.ascontiguousarray(_CONV_FULL.T),
        np.ascontiguousarray(_CONV_LOW.T),
    )

    def fn(*coords):
        return call(*coords, *consts)

    return fn


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _run(ctx_ec, kind: str, coords: tuple) -> tuple:
    """coords: (..., 16) u32 Montgomery limb arrays (3 or 6 of them)."""
    batch = coords[0].shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    n_pad = max(BLK, ((n + BLK - 1) // BLK) * BLK)

    def to_rows(c):
        flat = c.reshape(n, NLIMBS)
        if n_pad != n:
            flat = jnp.concatenate([flat, jnp.zeros((n_pad - n, NLIMBS), U32)])
        return flat.T

    outs = _ec_fn(ctx_ec, n_pad, kind, _is_cpu())(*(to_rows(c) for c in coords))
    return tuple(o.T[:n].reshape(*batch, NLIMBS) for o in outs)


def ec_add_pallas(ctx_ec, P: tuple, Q: tuple) -> tuple:
    """Fused complete add; P, Q tuples of (..., 16) u32 (broadcastable)."""
    bshape = jnp.broadcast_shapes(P[0].shape[:-1], Q[0].shape[:-1])
    coords = tuple(jnp.broadcast_to(c, (*bshape, NLIMBS)) for c in (*P, *Q))
    return _run(ctx_ec, "add", coords)


def ec_double_pallas(ctx_ec, P: tuple) -> tuple:
    """Fused complete double; P a tuple of (..., 16) u32 arrays."""
    return _run(ctx_ec, "double", tuple(P))

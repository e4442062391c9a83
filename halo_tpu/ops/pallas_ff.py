"""Pallas TPU kernel: fused batched Montgomery multiplication.

The jnp mont_mul in ops/ff.py lowers to three one-hot f32 contractions plus
carry chains, with every intermediate (the (N,512) product tensors) round-
tripping through HBM between fusions.  This kernel fuses the whole REDC
pipeline per row-block in VMEM:

  layout    (16, N) uint32 — limbs on sublanes, batch on the 128-wide lane
            axis (the jnp-facing wrapper transposes at the boundary)
  multiply  all 256 limb cross-products as one (256, B) uint32 VPU multiply
            (16x16-bit products are exact in uint32)
  colsums   lo/hi halves stacked to (512, B) f32, contracted against the
            static one-hot matrix (33, 512) on the MXU — exact in f32:
            entries < 2^16, <= 32 terms per column, sums < 2^22 < 2^24
  carries   unrolled 16-step chains on (B,) rows (VPU)
  REDC      T = a*b; m = (T mod R) * (-p^-1) mod R; out = (T + m*p) / R
            with the final conditional subtraction, exactly as
            ops/ff.py:mont_mul (same algorithm, fused in VMEM)

This is the arkworks-field-mul analog the north star asks to live as a
Pallas kernel (reference kernels: arkworks ark-ff, SURVEY.md §0, §7.1).
Differential tests: tests/test_pallas_ff.py; microbench: bench.py (pallasff).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ff import MASK, NLIMBS, U32, FFCtx, _CONV_FULL, _CONV_LOW, int_to_limbs

BLK = 512  # batch rows per grid step (lane-axis width)


def available() -> bool:
    return True


def _consts(ctx: FFCtx):
    p = ctx.p_limbs.astype(np.uint32)
    nprime = int_to_limbs(pow(ctx.m, -1, 1 << 256) * -1 % (1 << 256)).astype(np.uint32)
    return p, nprime


def _carry16_rows(cols):
    """cols: (k>=16, B) -> (16, B) canonical limbs + (B,) carry."""
    outs = []
    carry = jnp.zeros(cols.shape[1:], U32)
    for i in range(NLIMBS):
        v = cols[i] + carry
        outs.append(v & MASK)
        carry = v >> 16
    return jnp.stack(outs), carry


def _limb_conv_rows(a, b, conv_t):
    """Column sums of the limb product; a, b (16, B) -> (k, B) uint32."""
    rep_a = jnp.repeat(a, NLIMBS, axis=0)  # (256, B): row i*16+j = a_i
    rep_b = jnp.concatenate([b] * NLIMBS, axis=0)  # (256, B): row i*16+j = b_j
    prod = rep_a * rep_b  # exact in uint32
    # Mosaic has no uint32<->f32 cast; both halves are < 2^16 so int32 is safe
    flat = jnp.concatenate([prod & MASK, prod >> 16]).astype(jnp.int32).astype(jnp.float32)
    cols = jax.lax.dot_general(
        conv_t, flat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return cols.astype(jnp.int32).astype(U32)  # column sums < 2^22


def _mont_mul_kernel(a_ref, b_ref, p_ref, npr_ref, cf_ref, cl_ref, out_ref):
    a = a_ref[:]
    b = b_ref[:]
    B = a.shape[1]
    pc = p_ref[:]  # (16, 1)
    npr = jnp.broadcast_to(npr_ref[:], (NLIMBS, B))

    T = _limb_conv_rows(a, b, cf_ref[:])  # (33, B)
    t_low, carry_t = _carry16_rows(T[:NLIMBS])
    m_cols = _limb_conv_rows(t_low, npr, cl_ref[:])  # (16, B)
    m, _ = _carry16_rows(m_cols)
    U = _limb_conv_rows(m, jnp.broadcast_to(pc, (NLIMBS, B)), cf_ref[:])
    u_low, carry_u = _carry16_rows(U[:NLIMBS])
    _, carry_lo = _carry16_rows(t_low + u_low)

    high = T[NLIMBS:] + U[NLIMBS:]  # (17, B)
    # (no scatter in Mosaic: rebuild row 0 by concatenation)
    high = jnp.concatenate([(high[0] + carry_t + carry_u + carry_lo)[None], high[1:]])

    # final carry propagation over 17 columns
    outs = []
    carry = jnp.zeros((B,), U32)
    for i in range(NLIMBS + 1):
        v = high[i] + carry
        outs.append(v & MASK)
        carry = v >> 16
    res = jnp.stack(outs)  # (17, B)

    # conditional subtract p (a >= p iff no final borrow)
    d = res.astype(jnp.int32) - jnp.pad(pc, ((0, 1), (0, 0))).astype(jnp.int32)
    sub_outs = []
    borrow = jnp.zeros((B,), jnp.int32)
    for i in range(NLIMBS + 1):
        v = d[i] + borrow
        sub_outs.append(v & MASK)
        borrow = v >> 16
    diff = jnp.stack(sub_outs).astype(U32)
    ge = (borrow == 0)[None, :]
    out_ref[:] = jnp.where(ge, diff, res)[:NLIMBS]


@lru_cache(maxsize=8)
def _mont_mul_fn(ctx: FFCtx, n_pad: int, interpret: bool):
    p, nprime = _consts(ctx)
    grid = n_pad // BLK

    def whole(shape):  # constants replicated to every grid step
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        _mont_mul_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((NLIMBS, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            whole((NLIMBS, 1)),
            whole((NLIMBS, 1)),
            whole(_CONV_FULL.T.shape),
            whole(_CONV_LOW.T.shape),
        ],
        out_specs=pl.BlockSpec((NLIMBS, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n_pad), U32),
        interpret=interpret,
    )
    # numpy, not jnp: the cached closure may be reused across jit traces
    p_arr = np.ascontiguousarray(p[:, None])
    npr_arr = np.ascontiguousarray(nprime[:, None])
    cf = np.ascontiguousarray(_CONV_FULL.T)
    cl = np.ascontiguousarray(_CONV_LOW.T)

    def fn(at, bt):
        return call(at, bt, p_arr, npr_arr, cf, cl)

    return jax.jit(fn)


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def mont_mul_pallas(ctx: FFCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Montgomery product via the Pallas kernel.

    a, b: (N, 16) uint32 canonical limbs < p (jnp layout, limbs last).
    Pads N up to a BLK multiple; transposes at the boundary.  On CPU backends
    the kernel runs in interpreter mode (for CI differential tests).
    """
    n = a.shape[0]
    n_pad = max(BLK, ((n + BLK - 1) // BLK) * BLK)
    at = jnp.zeros((NLIMBS, n_pad), U32).at[:, :n].set(a.T)
    bt = jnp.zeros((NLIMBS, n_pad), U32).at[:, :n].set(b.T)
    out = _mont_mul_fn(ctx, n_pad, _is_cpu())(at, bt)
    return out[:, :n].T

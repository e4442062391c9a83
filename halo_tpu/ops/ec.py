"""Device-tier Pasta curve arithmetic: batched complete projective formulas.

TPU-first design: points are structure-of-arrays (X, Y, Z) Montgomery-limb
tensors; identity is (0:1:0).  Addition/doubling use the Renes-Costello-
Batina complete formulas for a=0 short-Weierstrass curves (12M for add),
which are branchless — every lane takes the same path, so batches vectorize
with no divergence (the TPU-native replacement for the reference's
rayon-parallel arkworks point ops, crates/group/src/group.rs:48-56).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import PALLAS, Affine, CurveCfg
from . import ff
from .ff import NLIMBS, U32, FFCtx

# Route batched add/double through the fused Pallas kernels on TPU backends
# (ops/pallas_ec.py) above this flattened batch size; the jnp path stays the
# reference implementation and the CPU/CI path.
from ..config import get_config

PALLAS_EC_MIN = get_config().pallas_ec_min
_PALLAS_EC_ON = get_config().pallas_ec


def _pallas_batch(*shapes) -> bool:
    if not _PALLAS_EC_ON or jax.default_backend() == "cpu":
        return False
    bshape = jnp.broadcast_shapes(*shapes)
    n = 1
    for d in bshape:
        n *= d
    return n >= PALLAS_EC_MIN


@dataclass(frozen=True)
class ECCtx:
    """Static per-curve context (hashable for jit)."""

    name: str
    p: int  # base field modulus
    r: int  # scalar field modulus
    b: int = 5

    @property
    def base(self) -> FFCtx:
        return ff.ctx_for(self.p)

    @property
    def scalar(self) -> FFCtx:
        return ff.ctx_for(self.r)

    @property
    def b3_mont(self) -> np.ndarray:
        return ff.int_to_limbs(3 * self.b * (1 << 256) % self.p)


def ec_ctx(cfg: CurveCfg) -> ECCtx:
    return ECCtx(name=cfg.name, p=cfg.p, r=cfg.r, b=cfg.b)


# A batched point is a tuple (X, Y, Z) of (..., 16) Montgomery limb arrays.
Point = tuple


def identity(ctx: ECCtx, batch_shape=()) -> Point:
    zero = jnp.zeros((*batch_shape, NLIMBS), U32)
    one = ff.mont_one(ctx.base, batch_shape)
    return (zero, one, zero)


def from_affine_ints(ctx: ECCtx, pts: list[Affine]) -> Point:
    """Host affine ints -> batched Montgomery projective (infinity -> (0:1:0))."""
    fctx = ctx.base
    xs = ff.ints_to_array([0 if p is None else p[0] for p in pts])
    ys = ff.ints_to_array([1 if p is None else p[1] for p in pts])
    inf = np.array([p is None for p in pts])
    X = np.array(ff.to_mont_jit(fctx, xs))
    Y = np.array(ff.to_mont_jit(fctx, ys))
    X[inf] = 0
    Y[inf] = np.asarray(ff.mont_one(fctx))
    Z = np.array(ff.mont_one(fctx, (len(pts),)))
    Z[inf] = 0
    return (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))


def from_limbs_canonical(ctx: ECCtx, xs, ys) -> Point:
    """(N,16) canonical affine limb arrays (e.g. SRS cache) -> device point."""
    fctx = ctx.base
    X = ff.to_mont_jit(fctx, jnp.asarray(xs, U32))
    Y = ff.to_mont_jit(fctx, jnp.asarray(ys, U32))
    Z = ff.mont_one(fctx, X.shape[:-1])
    return (X, Y, Z)


def to_affine_ints(ctx: ECCtx, P: Point) -> list[Affine]:
    """Batched projective -> host affine ints (None for infinity)."""
    X, Y, Z = P
    fctx = ctx.base
    zinv = ff.mont_inv_jit(fctx, Z)
    x = np.asarray(ff.from_mont_jit(fctx, ff.mont_mul_jit(fctx, X, zinv)))
    y = np.asarray(ff.from_mont_jit(fctx, ff.mont_mul_jit(fctx, Y, zinv)))
    inf = np.asarray(ff.is_zero(Z))
    xi = ff.array_to_ints(x.reshape(-1, NLIMBS))
    yi = ff.array_to_ints(y.reshape(-1, NLIMBS))
    return [None if inf.reshape(-1)[i] else (xi[i], yi[i]) for i in range(len(xi))]


def add(ctx: ECCtx, P: Point, Q: Point) -> Point:
    """Complete addition, a=0 (Renes-Costello-Batina alg. 7); 12M + 2*b3."""
    if _pallas_batch(P[0].shape[:-1], Q[0].shape[:-1]):
        from . import pallas_ec

        return pallas_ec.ec_add_pallas(ctx, P, Q)
    f = ctx.base
    mul = partial(ff.mont_mul, f)
    fadd = partial(ff.add, f)
    fsub = partial(ff.sub, f)
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    b3 = jnp.asarray(ctx.b3_mont, U32)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(fadd(X1, Y1), fadd(X2, Y2))
    t3 = fsub(t3, fadd(t0, t1))
    t4 = mul(fadd(Y1, Z1), fadd(Y2, Z2))
    t4 = fsub(t4, fadd(t1, t2))
    X3 = mul(fadd(X1, Z1), fadd(X2, Z2))
    Y3 = fsub(X3, fadd(t0, t2))
    t0 = fadd(fadd(t0, t0), t0)
    t2 = mul(b3, t2)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    Y3 = mul(b3, Y3)
    X3 = fsub(mul(t3, t1), mul(t4, Y3))
    Y3 = fadd(mul(t1, Z3), mul(Y3, t0))
    Z3 = fadd(mul(Z3, t4), mul(t0, t3))
    return (X3, Y3, Z3)


def double(ctx: ECCtx, P: Point) -> Point:
    """Complete doubling, a=0 (alg. 9); 6M + 2S + 1*b3."""
    if _pallas_batch(P[0].shape[:-1]):
        from . import pallas_ec

        return pallas_ec.ec_double_pallas(ctx, P)
    f = ctx.base
    mul = partial(ff.mont_mul, f)
    fadd = partial(ff.add, f)
    fsub = partial(ff.sub, f)
    X, Y, Z = P
    b3 = jnp.asarray(ctx.b3_mont, U32)

    t0 = mul(Y, Y)
    Z3 = fadd(t0, t0)
    Z3 = fadd(Z3, Z3)
    Z3 = fadd(Z3, Z3)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    t2 = mul(b3, t2)
    X3 = mul(t2, Z3)
    Y3 = fadd(t0, t2)
    Z3 = mul(t1, Z3)
    t1 = fadd(t2, t2)
    t2 = fadd(t1, t2)
    t0 = fsub(t0, t2)
    Y3 = mul(t0, Y3)
    Y3 = fadd(X3, Y3)
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = fadd(X3, X3)
    return (X3, Y3, Z3)


def negate(ctx: ECCtx, P: Point) -> Point:
    X, Y, Z = P
    return (X, ff.neg(ctx.base, Y), Z)


def select(mask, P: Point, Q: Point) -> Point:
    """Per-lane select: mask True -> P else Q; mask shape = batch."""
    m = mask[..., None]
    return tuple(jnp.where(m, p, q) for p, q in zip(P, Q))


def scalar_mul(ctx: ECCtx, P: Point, k: jnp.ndarray) -> Point:
    """Batched double-and-add: k is (..., 16) canonical scalar limbs."""

    def body_wrap(i, state):
        limb = i // 16
        shift = (i % 16).astype(U32)
        bit = (k[..., limb] >> shift) & 1
        acc, base = state
        acc = select(bit == 1, add(ctx, acc, base), acc)
        base = double(ctx, base)
        return acc, base

    bshape = jnp.broadcast_shapes(P[0].shape[:-1], k.shape[:-1])
    P = tuple(jnp.broadcast_to(c, (*bshape, NLIMBS)) for c in P)
    acc0 = identity(ctx, bshape)
    acc, _ = jax.lax.fori_loop(0, 255, body_wrap, (acc0, P))
    return acc


def tree_reduce(ctx: ECCtx, P: Point) -> Point:
    """Sum a (N, 16) batch of points into one point via a log-depth tree."""
    X, Y, Z = P
    n = X.shape[0]
    # pad to power of two with identity
    size = 1
    while size < n:
        size *= 2
    if size != n:
        pad = identity(ctx, (size - n,))
        X = jnp.concatenate([X, pad[0]])
        Y = jnp.concatenate([Y, pad[1]])
        Z = jnp.concatenate([Z, pad[2]])
    cur = (X, Y, Z)
    while cur[0].shape[0] > 1:
        half = cur[0].shape[0] // 2
        left = tuple(c[:half] for c in cur)
        right = tuple(c[half:] for c in cur)
        cur = add(ctx, left, right)
    return tuple(c[0] for c in cur)


def eq_points(ctx: ECCtx, P: Point, Q: Point) -> jnp.ndarray:
    """Projective equality: X1*Z2 == X2*Z1 and Y1*Z2 == Y2*Z1 (plus inf cases)."""
    f = ctx.base
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    inf1 = ff.is_zero(Z1)
    inf2 = ff.is_zero(Z2)
    x_eq = ff.eq(ff.mont_mul(f, X1, Z2), ff.mont_mul(f, X2, Z1))
    y_eq = ff.eq(ff.mont_mul(f, Y1, Z2), ff.mont_mul(f, Y2, Z1))
    return jnp.where(inf1 | inf2, inf1 == inf2, x_eq & y_eq)


add_jit = jax.jit(add, static_argnums=0)
double_jit = jax.jit(double, static_argnums=0)
scalar_mul_jit = jax.jit(scalar_mul, static_argnums=0)

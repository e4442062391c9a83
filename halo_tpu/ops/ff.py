"""Device-tier Pasta field arithmetic: batched 16x16-bit limb vectors in JAX.

TPU-first design (SURVEY.md §7.1, §7.4 hard part #1): no native 64-bit
integer multiply on TPU, so field elements are 16 little-endian 16-bit limbs
held in uint32 lanes.  16x16-bit products fit uint32 exactly; partial
products are split lo/hi-16 before accumulation so column sums stay < 2^22.
Multiplication uses Montgomery reduction (R = 2^256, matching arkworks'
internal form, reference crates/group/src/wrappers.rs:601-617), interleaved
CIOS-style over the 16 limbs.  Everything is vectorized over arbitrary
leading batch axes and jittable; inversion is a fori_loop Fermat pow.

Layout note: jnp-level code keeps limbs last (..., 16); Pallas kernels
transpose to (limbs, batch) to put the batch on the 128-wide lane axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FP_MOD, FQ_MOD

NLIMBS = 16
MASK = 0xFFFF
U32 = jnp.uint32


def int_to_limbs(x: int) -> np.ndarray:
    return np.frombuffer(int(x).to_bytes(32, "little"), dtype="<u2").astype(np.uint32)


def limbs_to_int(a) -> int:
    a = np.asarray(a, dtype=np.uint32) & MASK
    return int.from_bytes(a.astype("<u2").tobytes(), "little")


def ints_to_array(xs: list[int]) -> np.ndarray:
    """list of ints -> (N, 16) uint32 limb array."""
    from .. import native

    fl = native.fastlimbs()
    if fl is not None:
        buf = fl.ints_to_bytes256(xs)  # ~25x the generator+join path
    else:
        buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    return np.frombuffer(buf, dtype="<u2").astype(np.uint32).reshape(len(xs), NLIMBS)


def array_to_ints(a) -> list[int]:
    # measured: int.from_bytes over slices beats _PyLong_FromByteArray
    # (~0.5 vs ~1.9 us/elt), so no fastlimbs path here
    a = np.asarray(a, dtype=np.uint32).astype("<u2")
    raw = a.tobytes()
    return [int.from_bytes(raw[32 * i : 32 * i + 32], "little") for i in range(a.shape[0])]


@dataclass(frozen=True)
class FFCtx:
    """Per-modulus constants for device field ops (hashable jit static arg)."""

    m: int  # modulus as python int

    @property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.m)

    @property
    def n0inv(self) -> int:
        # -m^{-1} mod 2^16
        return (-pow(self.m, -1, 1 << 16)) % (1 << 16)

    @property
    def r2(self) -> np.ndarray:  # R^2 mod m (to enter Montgomery form)
        return int_to_limbs((1 << 512) % self.m)

    @property
    def r1(self) -> np.ndarray:  # R mod m (Montgomery form of 1)
        return int_to_limbs((1 << 256) % self.m)

    @property
    def inv_exp_bits(self) -> np.ndarray:  # bits of m-2, LSB first
        e = self.m - 2
        return np.array([(e >> i) & 1 for i in range(256)], dtype=np.uint32)


FP_CTX = FFCtx(FP_MOD)
FQ_CTX = FFCtx(FQ_MOD)


def ctx_for(modulus: int) -> FFCtx:
    return FP_CTX if modulus == FP_MOD else FQ_CTX


# ---------------- core limb kernels (jnp, batched) ---------------- #


def _carry_prop(cols: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Sequential carry propagation; cols (..., k) -> (..., n_out) 16-bit limbs."""
    outs = []
    carry = jnp.zeros(cols.shape[:-1], U32)
    k = cols.shape[-1]
    for i in range(n_out):
        v = (cols[..., i] if i < k else jnp.zeros_like(carry)) + carry
        outs.append(v & MASK)
        carry = v >> 16
    return jnp.stack(outs, axis=-1)


def _sub_if_ge(a: jnp.ndarray, p_limbs: jnp.ndarray) -> jnp.ndarray:
    """a (..., n) minus p if a >= p (n >= 16; p zero-extended)."""
    n = a.shape[-1]
    p_ext = jnp.zeros(n, U32).at[:NLIMBS].set(jnp.asarray(p_limbs, U32))
    d = a.astype(jnp.int32) - p_ext.astype(jnp.int32)
    outs = []
    borrow = jnp.zeros(a.shape[:-1], jnp.int32)
    for i in range(n):
        v = d[..., i] + borrow
        outs.append(v & MASK)
        borrow = v >> 16  # arithmetic shift: -1 if borrow
    diff = jnp.stack(outs, axis=-1).astype(U32)
    ge = borrow == 0  # no final borrow => a >= p
    return jnp.where(ge[..., None], diff, a)[..., :NLIMBS]


def add(ctx: FFCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = _carry_prop(a + b, NLIMBS + 1)
    return _sub_if_ge(s, ctx.p_limbs)


def sub(ctx: FFCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    p = jnp.asarray(ctx.p_limbs, U32)
    d = a.astype(jnp.int32) + p.astype(jnp.int32) - b.astype(jnp.int32)
    outs = []
    carry = jnp.zeros(a.shape[:-1], jnp.int32)
    for i in range(NLIMBS):
        v = d[..., i] + carry
        outs.append(v & MASK)
        carry = v >> 16
    s = jnp.stack(outs, axis=-1).astype(U32)
    s = jnp.concatenate([s, carry.astype(U32)[..., None]], axis=-1)
    return _sub_if_ge(s, ctx.p_limbs)


def neg(ctx: FFCtx, a: jnp.ndarray) -> jnp.ndarray:
    return sub(ctx, jnp.zeros_like(a), a)


def _conv_matrices():
    """Static one-hot contraction matrices for the limb convolution.

    Row layout of the flattened lo/hi tensor: index h*256 + i*16 + j where
    h=0 is the low-16 half (-> column i+j) and h=1 the high half (-> i+j+1).
    f32 is exact here: entries < 2^16, <= 32 terms per column => sums < 2^22.
    """
    full = np.zeros((512, 2 * NLIMBS + 1), np.float32)
    low = np.zeros((512, NLIMBS), np.float32)
    for h in range(2):
        for i in range(NLIMBS):
            for j in range(NLIMBS):
                k = i + j + h
                full[h * 256 + i * 16 + j, k] = 1.0
                if k < NLIMBS:
                    low[h * 256 + i * 16 + j, k] = 1.0
    return full, low


_CONV_FULL, _CONV_LOW = _conv_matrices()


def _limb_conv(a: jnp.ndarray, b: jnp.ndarray, conv: np.ndarray) -> jnp.ndarray:
    """Column sums of the 16x16 limb product of a and b via one dot op."""
    prod = a[..., :, None] * b[..., None, :]  # (..., 16, 16) exact in uint32
    lohi = jnp.stack([prod & MASK, prod >> 16], axis=-3)  # (..., 2, 16, 16)
    flat = lohi.reshape(*lohi.shape[:-3], 512).astype(jnp.float32)
    # HIGHEST: TPU matmuls default to bf16 passes, which would destroy the
    # 16-bit limb values; full-f32 contraction is exact (sums < 2^22 < 2^24).
    return jnp.dot(
        flat,
        jnp.asarray(conv),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(U32)


def _carry16_keep(cols: jnp.ndarray):
    """Carry-propagate 16 columns; return (canonical limbs, final carry)."""
    outs = []
    carry = jnp.zeros(cols.shape[:-1], U32)
    for i in range(NLIMBS):
        v = cols[..., i] + carry
        outs.append(v & MASK)
        carry = v >> 16
    return jnp.stack(outs, axis=-1), carry


def mont_mul(ctx: FFCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p for canonical-limb inputs < p.

    Separated-operand REDC with the limb convolutions expressed as one-hot
    f32 contractions (MXU-friendly; exact since all column sums < 2^22).
    """
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, (*batch, NLIMBS))
    b = jnp.broadcast_to(b, (*batch, NLIMBS))
    p = jnp.asarray(ctx.p_limbs, U32)
    nprime = jnp.asarray(int_to_limbs(pow(ctx.m, -1, 1 << 256) * -1 % (1 << 256)), U32)

    T = _limb_conv(a, b, _CONV_FULL)  # (..., 33) columns < 2^22
    t_low, carry_t = _carry16_keep(T[..., :NLIMBS])
    # m = (T mod R) * (-p^-1) mod R
    m_cols = _limb_conv(t_low, nprime, _CONV_LOW)
    m, _ = _carry16_keep(m_cols)
    # U = m * p;  (T + U) / R
    U = _limb_conv(m, p, _CONV_FULL)
    u_low, carry_u = _carry16_keep(U[..., :NLIMBS])
    # low halves of T+U sum to 0 mod R; their combined carry flows into col 16.
    # t_low + u_low: limbwise sums < 2^17; propagate to get the cross carry.
    _, carry_lo = _carry16_keep(t_low + u_low)
    high = T[..., NLIMBS:] + U[..., NLIMBS:]
    high = high.at[..., 0].add(carry_t + carry_u + carry_lo)
    res = _carry_prop(high, NLIMBS + 1)
    return _sub_if_ge(res, ctx.p_limbs)


def mont_sq(ctx: FFCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, a)


def to_mont(ctx: FFCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, jnp.asarray(ctx.r2, U32))


def from_mont(ctx: FFCtx, a: jnp.ndarray) -> jnp.ndarray:
    one = jnp.zeros(NLIMBS, U32).at[0].set(1)
    return mont_mul(ctx, a, one)


def mont_one(ctx: FFCtx, batch_shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(ctx.r1, U32), (*batch_shape, NLIMBS))


def mont_pow_fixed(ctx: FFCtx, a: jnp.ndarray, exp_bits: np.ndarray) -> jnp.ndarray:
    """a^e in Montgomery form; e given as LSB-first bit array (static length)."""
    bits = jnp.asarray(exp_bits, U32)

    def body(i, state):
        acc, base = state
        take = bits[i] == 1
        acc = jnp.where(take[..., None] if take.ndim else take, mont_mul(ctx, acc, base), acc)
        base = mont_sq(ctx, base)
        return acc, base

    acc0 = mont_one(ctx, a.shape[:-1])
    acc, _ = jax.lax.fori_loop(0, len(exp_bits), body, (acc0, a))
    return acc


def mont_inv(ctx: FFCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse: a^{p-2}; in Montgomery domain maps aR -> a^{-1}R."""
    return mont_pow_fixed(ctx, a, ctx.inv_exp_bits)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


# jitted entry points (ctx is static via hash of the frozen dataclass)
add_jit = jax.jit(add, static_argnums=0)
sub_jit = jax.jit(sub, static_argnums=0)
mont_mul_jit = jax.jit(mont_mul, static_argnums=0)
mont_inv_jit = jax.jit(mont_inv, static_argnums=0)
to_mont_jit = jax.jit(to_mont, static_argnums=0)
from_mont_jit = jax.jit(from_mont, static_argnums=0)

"""Device-tier radix-2 NTT over the 2-adic Pasta multiplicative subgroups.

TPU-first replacement for ark-poly's Radix2EvaluationDomain FFT
(reference uses GeneralEvaluationDomain, crates/group/src/poly.rs:11).
Matches ark's evaluation ordering: ntt(coeffs)[i] = p(w^i) with w the
canonical 2^k root derived from the field generator (5), natural order.

Iterative Cooley-Tukey on Montgomery-limb arrays: bit-reverse gather, then
k fully-vectorized butterfly stages (each one reshape + one batched
mont_mul + add/sub).  The multi-chip variant (halo_tpu/parallel/ntt.py)
keeps stages local until the butterfly stride crosses the shard boundary,
then re-shards with all_to_all (SURVEY.md §2.6).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import two_adic_root_of_unity
from . import ff
from .ff import NLIMBS, U32, FFCtx


@lru_cache(maxsize=64)
def _plan(m: int, log_n: int, inverse: bool):
    """Host-side twiddle/permutation plan: (bitrev index array, per-stage twiddles)."""
    n = 1 << log_n
    w = two_adic_root_of_unity(m, log_n)
    if inverse:
        w = pow(w, -1, m)
    # bit-reversal permutation
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        rev[i] = int(format(i, f"0{log_n}b")[::-1], 2) if log_n else 0
    # per-stage twiddles in Montgomery form: stage s uses w_m = w^(n/m), m = 2^s
    stage_twiddles = []
    for s in range(1, log_n + 1):
        mlen = 1 << s
        wm = pow(w, n // mlen, m)
        tw = [pow(wm, j, m) * (1 << 256) % m for j in range(mlen // 2)]
        stage_twiddles.append(ff.ints_to_array(tw))
    n_inv_mont = pow(n, -1, m) * (1 << 256) % m if inverse else None
    return rev, stage_twiddles, (ff.int_to_limbs(n_inv_mont) if inverse else None)


def _ntt_impl(ctx: FFCtx, a: jnp.ndarray, log_n: int, inverse: bool) -> jnp.ndarray:
    """In-trace NTT with twiddles inlined as constants — for call sites that
    are already inside a jit/shard_map trace (e.g. the distributed NTT's
    per-shard stages, small sizes).  Top-level callers should use ntt()/
    intt(), which pass the plan as runtime arguments instead."""
    n = 1 << log_n
    assert a.shape[-2] == n
    rev, stage_tw, n_inv = _plan(ctx.m, log_n, inverse)
    if log_n >= 1 and _use_cpu_loop(n):
        # uniform-shape stage loop (see _ntt_loop_fn): keeps the per-shard
        # graphs of the distributed NTT small on the XLA:CPU backend
        return _ntt_loop_core(
            ctx, log_n, inverse, a, jnp.asarray(rev),
            jnp.asarray(n_inv if inverse else np.zeros(NLIMBS, np.uint32), U32),
            jnp.asarray(stage_tw[-1], U32))
    x = a[..., jnp.asarray(rev), :]
    for s in range(1, log_n + 1):
        mlen = 1 << s
        half = mlen // 2
        tw = jnp.asarray(stage_tw[s - 1], U32)  # (half, 16)
        xb = x.reshape(*x.shape[:-2], n // mlen, mlen, NLIMBS)
        even = xb[..., :half, :]
        odd = xb[..., half:, :]
        t = ff.mont_mul(ctx, odd, tw)
        x = jnp.concatenate([ff.add(ctx, even, t), ff.sub(ctx, even, t)], axis=-2)
        x = x.reshape(*a.shape[:-2], n, NLIMBS)
    if inverse:
        x = ff.mont_mul(ctx, x, jnp.asarray(n_inv, U32))
    return x


@lru_cache(maxsize=64)
def _plan_device(m: int, log_n: int, inverse: bool):
    """Device-resident plan arrays (bitrev indices, per-stage twiddles, n^-1).

    Passed to the jitted kernel as ARGUMENTS, not closure constants: at
    2^22 the twiddles alone are ~270 MB, which embedded as HLO constants
    blew past the axon remote-compile request limit (HTTP 413) and bloated
    every prover compile."""
    rev, stage_tw, n_inv = _plan(m, log_n, inverse)
    return (
        jnp.asarray(rev),
        tuple(jnp.asarray(t, U32) for t in stage_tw),
        jnp.asarray(n_inv if inverse else np.zeros(NLIMBS, np.uint32), U32),
    )


@lru_cache(maxsize=64)
def _ntt_fn(m: int, log_n: int, inverse: bool):
    ctx = ff.ctx_for(m)
    n = 1 << log_n

    def fn(a, rev, n_inv, *stage_tw):
        x = a[..., rev, :]
        for s in range(1, log_n + 1):
            mlen = 1 << s
            half = mlen // 2
            tw = stage_tw[s - 1]  # (half, 16)
            xb = x.reshape(*x.shape[:-2], n // mlen, mlen, NLIMBS)
            even = xb[..., :half, :]
            odd = xb[..., half:, :]
            t = ff.mont_mul(ctx, odd, tw)
            x = jnp.concatenate([ff.add(ctx, even, t), ff.sub(ctx, even, t)], axis=-2)
            x = x.reshape(*a.shape[:-2], n, NLIMBS)
        if inverse:
            x = ff.mont_mul(ctx, x, n_inv)
        return x

    return jax.jit(fn)


# ---------------- loop-based CPU path ---------------- #
#
# The unrolled _ntt_fn emits log_n full mont_mul graphs; at n >= 2^14 the
# resulting XLA:CPU executable is large enough to trip three distinct
# backend defects (reproduced in round 4): backend_compile segfaults after
# graph accumulation, executable.serialize() segfaults at persistent-cache
# write, and deserialize_executable segfaults at cache read.  This variant
# runs the stages as ONE fori_loop body with uniform shapes — the stage-s
# twiddle is a strided gather into the single full twiddle vector
# W[j] = w^j (note stage_tw[s-1][j] == W[j << (log_n - s)]) — so the HLO
# stays tiny regardless of n.  Bit-identical to the unrolled path
# (same butterflies, same exact Montgomery arithmetic).

CPU_LOOP_NTT_MIN = 1 << 12


def _use_cpu_loop(n: int) -> bool:
    import os

    env = os.environ.get("HALO_TPU_NTT_LOOP")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "cpu" and n >= CPU_LOOP_NTT_MIN


def _ntt_loop_core(ctx: FFCtx, log_n: int, inverse: bool, a, rev, n_inv, W):
    n = 1 << log_n
    x = a[..., rev, :]
    iota = jnp.arange(n, dtype=jnp.int32)

    def stage(s, x):
        half = jnp.int32(1) << (s - 1)
        j = iota & (half - 1)
        tw_idx = j << (jnp.int32(log_n) - s)
        bit = (iota & half) != 0
        lo = jnp.take(x, iota & ~half, axis=-2)
        hi = jnp.take(x, iota | half, axis=-2)
        t = ff.mont_mul(ctx, hi, jnp.take(W, tw_idx, axis=0))
        return jnp.where(bit[:, None], ff.sub(ctx, lo, t), ff.add(ctx, lo, t))

    x = jax.lax.fori_loop(1, log_n + 1, stage, x)
    if inverse:
        x = ff.mont_mul(ctx, x, n_inv)
    return x


@lru_cache(maxsize=64)
def _ntt_loop_fn(m: int, log_n: int, inverse: bool):
    ctx = ff.ctx_for(m)

    def fn(a, rev, n_inv, W):
        return _ntt_loop_core(ctx, log_n, inverse, a, rev, n_inv, W)

    return jax.jit(fn)


# ---------------- rows-layout accelerator path (v2) ---------------- #
#
# The jnp mont_mul materializes (batch, 2, 16, 16) conv tensors; at 2^22
# batch that is an 8 GB HLO temp and the forward NTT OOMs a 16 GB chip.
# The v2 path runs every butterfly through the fused quasi-2p Pallas
# kernel (ops/pallas_mont.py:bfly) in limb-rows layout: one kernel
# instantiation serves all stages (identical (16, n/2) shapes), values
# stay lazily reduced until a single final canonicalization.

ROWS_NTT_MIN = 1 << 12  # below this the jnp path is fine and CPU-testable


def _use_rows_path(n: int) -> bool:
    import os

    env = os.environ.get("HALO_TPU_NTT_V2")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "cpu" and n >= ROWS_NTT_MIN


@lru_cache(maxsize=64)
def _plan_rows(m: int, log_n: int, inverse: bool):
    """Device twiddle plan in rows layout: per-stage (16, half) arrays."""
    rev, stage_tw, n_inv = _plan(m, log_n, inverse)
    return (
        jnp.asarray(rev),
        tuple(jnp.asarray(np.ascontiguousarray(t.T), U32) for t in stage_tw),
        jnp.asarray(
            (n_inv if inverse else np.zeros(NLIMBS, np.uint32))[:, None], U32),
    )


@lru_cache(maxsize=64)
def _ntt_rows_fn(m: int, log_n: int, inverse: bool):
    from ..curves import PALLAS, VESTA
    from . import pallas_mont as pk

    cfg = PALLAS if PALLAS.r == m or PALLAS.p == m else VESTA
    # NTT domains live in the SCALAR field of the curve whose base field is
    # the other Pasta prime; the MontCtx only needs the modulus (b unused
    # by mm/bfly/canon kernels but part of the cache key).
    mctx = pk.mont_ctx(m, 5)
    n = 1 << log_n

    def fn(a, rev, n_inv, *stage_tw):
        # a: (k, n, 16) (k = 1 for the unbatched case); rows (16, k, n)
        k = a.shape[0]
        x = jnp.transpose(a, (2, 0, 1))[:, :, rev]
        for s in range(1, log_n + 1):
            mlen = 1 << s
            half = mlen // 2
            blocks = n // mlen
            xb = x.reshape(NLIMBS, k, blocks, mlen)
            even = xb[..., :half].reshape(NLIMBS, k * n // 2)
            odd = xb[..., half:].reshape(NLIMBS, k * n // 2)
            twf = jnp.broadcast_to(stage_tw[s - 1][:, None, None, :],
                                   (NLIMBS, k, blocks, half)).reshape(NLIMBS, k * n // 2)
            e2, o2 = pk.bfly_rows(mctx, even, odd, twf)
            x = jnp.concatenate(
                [e2.reshape(NLIMBS, k, blocks, half), o2.reshape(NLIMBS, k, blocks, half)],
                axis=3).reshape(NLIMBS, k, n)
        x = x.reshape(NLIMBS, k * n)
        if inverse:
            x = pk.mulc_rows(mctx, x, n_inv)
        x = pk.canon_rows(mctx, x)
        return jnp.transpose(x.reshape(NLIMBS, k, n), (1, 2, 0))

    return jax.jit(fn)


def _ntt_dispatch(ctx: FFCtx, a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    log_n = int(a.shape[-2]).bit_length() - 1
    assert a.shape[-2] == 1 << log_n
    n = 1 << log_n
    if a.ndim in (2, 3) and _use_rows_path(n) and (n // 2) % 512 == 0:
        rev, stage_tw, n_inv = _plan_rows(ctx.m, log_n, inverse)
        fn = _ntt_rows_fn(ctx.m, log_n, inverse)
        if a.ndim == 2:
            return fn(a[None], rev, n_inv, *stage_tw)[0]
        return fn(a, rev, n_inv, *stage_tw)
    rev, stage_tw, n_inv = _plan_device(ctx.m, log_n, inverse)
    if log_n >= 1 and _use_cpu_loop(n):
        # stage_tw[-1] is the full vector [w^j for j < n/2]
        return _ntt_loop_fn(ctx.m, log_n, inverse)(a, rev, n_inv, stage_tw[-1])
    return _ntt_fn(ctx.m, log_n, inverse)(a, rev, n_inv, *stage_tw)


def ntt(ctx: FFCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT: Montgomery coeffs (..., n, 16) -> evals at [w^0, w^1, ...]."""
    return _ntt_dispatch(ctx, a, False)


def intt(ctx: FFCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: evals -> Montgomery coefficients."""
    return _ntt_dispatch(ctx, a, True)


# dispatchers cache their own jitted kernels; aliases kept for callers
ntt_jit = ntt
intt_jit = intt

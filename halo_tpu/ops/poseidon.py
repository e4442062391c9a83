"""Device-tier batched Poseidon permutation (kimchi parameters).

Applies the 55-full-round permutation (x^7 sbox -> 3x3 MDS -> round
constants; reference crates/poseidon/src/inner_sponge.rs:3-49) to a BATCH of
states at once, each field element a 16x16-bit limb vector.  The host tier
(halo_tpu/poseidon/sponge.py, one state at a time) stays authoritative for
the few transcript hashes per round; this kernel serves bulk work: hashing
many leaves, batched witness generation for Poseidon gate rows, and the
device Poseidon microbenchmark.

All multiplies go through ops/ff.py's Montgomery pipeline (and therefore
through the Pallas mont_mul kernel when routed); constants are pre-converted
to Montgomery form once per field.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FP_MOD, FQ_MOD
from ..poseidon.constants import FP_MDS, FP_ROUND_CONSTANTS, FQ_MDS, FQ_ROUND_CONSTANTS
from ..poseidon.sponge import PERM_ROUNDS_FULL, STATE_SIZE
from . import ff
from .ff import NLIMBS, U32, FFCtx

R256 = 1 << 256


@lru_cache(maxsize=2)
def _mont_consts(m: int):
    """(MDS (3,3,16), RCS (55,3,16)) in Montgomery limb form."""
    if m == FQ_MOD:
        mds, rcs = FQ_MDS, FQ_ROUND_CONSTANTS
    else:
        assert m == FP_MOD
        mds, rcs = FP_MDS, FP_ROUND_CONSTANTS
    mds_l = np.stack([
        np.stack([ff.int_to_limbs(v * R256 % m) for v in row]) for row in mds
    ])
    rcs_l = np.stack([
        np.stack([ff.int_to_limbs(v * R256 % m) for v in row]) for row in rcs
    ])
    return mds_l, rcs_l


def _sbox7(ctx: FFCtx, x: jnp.ndarray) -> jnp.ndarray:
    x2 = ff.mont_mul(ctx, x, x)
    x3 = ff.mont_mul(ctx, x2, x)
    x4 = ff.mont_mul(ctx, x2, x2)
    return ff.mont_mul(ctx, x4, x3)


def permute_batch(ctx: FFCtx, state: jnp.ndarray) -> jnp.ndarray:
    """state: (N, 3, 16) Montgomery-form limbs -> permuted (N, 3, 16).

    One lax.scan over the 55 rounds; each round is 3 sbox pipelines plus a
    3x3 MDS of batched Montgomery mul-adds, all vectorized over N.
    """
    mds_l, rcs_l = _mont_consts(ctx.m)
    mds = jnp.asarray(mds_l, U32)  # (3, 3, 16)
    rcs = jnp.asarray(rcs_l, U32)  # (55, 3, 16)

    def round_fn(st, rc):
        # st: (N, 3, 16); sbox all three words at once
        sb = _sbox7(ctx, st.reshape(-1, NLIMBS)).reshape(st.shape)
        outs = []
        for i in range(STATE_SIZE):
            acc = ff.mont_mul(ctx, mds[i, 0], sb[:, 0])
            acc = ff.add(ctx, acc, ff.mont_mul(ctx, mds[i, 1], sb[:, 1]))
            acc = ff.add(ctx, acc, ff.mont_mul(ctx, mds[i, 2], sb[:, 2]))
            acc = ff.add(ctx, acc, jnp.broadcast_to(rc[i], acc.shape))
            outs.append(acc)
        return jnp.stack(outs, axis=1), None

    out, _ = jax.lax.scan(round_fn, state, rcs)
    return out


permute_batch_jit = jax.jit(permute_batch, static_argnums=0)


def permute_ints(m: int, states: list[list[int]]) -> list[list[int]]:
    """Convenience host-facing wrapper: canonical-int states in/out."""
    ctx = ff.ctx_for(m)
    flat = [v for st in states for v in st]
    a = ff.to_mont_jit(ctx, ff.ints_to_array(flat)).reshape(len(states), STATE_SIZE, NLIMBS)
    out = permute_batch_jit(ctx, a)
    back = ff.from_mont_jit(ctx, out.reshape(-1, NLIMBS))
    ints = ff.array_to_ints(np.asarray(back))
    return [ints[i * STATE_SIZE : (i + 1) * STATE_SIZE] for i in range(len(states))]

"""Rows-layout EC composites over the v2 Pallas kernels (pallas_mont).

The v1 fused EC kernels (ops/pallas_ec.py) carry ~4000-op Mosaic bodies;
every pallas_call embeds the body into the enclosing jit's MLIR, so graphs
with dozens of adds (MSM trees, scalar-mul loops) took tens of minutes
just to LOWER at IPA production sizes.  The v2 kernels' Kogge-Stone bodies
are ~10x smaller, and these composites build the remaining EC vocabulary
(select, shared/per-lane scalar mul, tree sums) on top of them.

Points are tuples of 3 (16, N) uint32 Montgomery limb arrays (quasi-2p
domain); N must be a multiple of pallas_mont.BLK for the kernel calls
(helpers pad internally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import ff, pallas_mont as pk
from .ff import NLIMBS, U32


def identity_rows(mctx: pk.MontCtx, n: int):
    r1 = ff.int_to_limbs((1 << 256) % mctx.p)
    return (jnp.zeros((NLIMBS, n), U32),
            jnp.broadcast_to(jnp.asarray(r1, U32)[:, None], (NLIMBS, n)),
            jnp.zeros((NLIMBS, n), U32))


def select_rows(mask, P, Q):
    """Lanewise select: mask (N,) bool -> P else Q (tuples of (16, N))."""
    m = mask[None, :]
    return tuple(jnp.where(m, p, q) for p, q in zip(P, Q))


def _pad(parts, n):
    npad = max(pk.BLK, ((n + pk.BLK - 1) // pk.BLK) * pk.BLK)
    if npad == n:
        return parts, n
    return [jnp.concatenate([c, jnp.zeros((NLIMBS, npad - n), U32)], axis=1)
            for c in parts], npad


def padd(mctx, P, Q):
    n = P[0].shape[1]
    parts, npad = _pad([*P, *Q], n)
    out = pk.padd_rows(mctx, tuple(parts[:3]), tuple(parts[3:]))
    return tuple(c[:, :n] for c in out)


def pdbl(mctx, P):
    n = P[0].shape[1]
    parts, npad = _pad(list(P), n)
    out = pk.pdbl_rows(mctx, tuple(parts))
    return tuple(c[:, :n] for c in out)


def scalar_mul_rows(mctx, P, k_rows, bits: int = 255):
    """Batched double-and-add: k_rows (16, N) canonical scalar limbs (or
    (16, 1) broadcast for a shared scalar)."""
    n = P[0].shape[1]
    k_rows = jnp.broadcast_to(k_rows, (NLIMBS, n))

    def body(i, state):
        acc, base = state
        limb = i // 16
        shift = (i % 16).astype(U32)
        bit = (k_rows[limb] >> shift) & 1
        acc = select_rows(bit == 1, padd(mctx, acc, base), acc)
        base = pdbl(mctx, base)
        return acc, base

    acc0 = identity_rows(mctx, n)
    acc, _ = jax.lax.fori_loop(0, bits, body, (acc0, P))
    return acc


def tree_sum_rows(mctx, P):
    """Sum a (16, N) point batch over lanes via log2 halvings."""
    n = P[0].shape[1]
    size = 1 << max(0, (n - 1).bit_length())
    if size != n:
        ident = identity_rows(mctx, size - n)
        P = tuple(jnp.concatenate([c, i], axis=1) for c, i in zip(P, ident))
    while P[0].shape[1] > 1:
        h = P[0].shape[1] // 2
        P = padd(mctx, tuple(c[:, :h] for c in P), tuple(c[:, h:] for c in P))
    return P


def msm_naive_rows(mctx, P, k_rows, bits: int = 255):
    """MSM via batched double-and-add + tree reduce; returns a 1-lane point."""
    prods = scalar_mul_rows(mctx, P, k_rows, bits)
    return tree_sum_rows(mctx, prods)


def canon(mctx, P):
    n = P[0].shape[1]
    parts, npad = _pad(list(P), n)
    return tuple(pk.canon_rows(mctx, c)[:, :n] for c in parts)


def from_cols(P_cols):
    """((N,16),)*3 -> rows layout."""
    return tuple(jnp.transpose(c) for c in P_cols)


def to_cols(P_rows):
    return tuple(jnp.transpose(c) for c in P_rows)

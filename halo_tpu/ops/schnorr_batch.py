"""Device-tier batched Schnorr verification.

The reference's throughput harness (crates/plonk/src/main.rs:36-47) verifies
one signature N times across 20 rayon threads (~1,300 sig/s on its
benchmark box, documents/thesis/08-benchmarks/index.md:69-70).  Per verify
that is one Poseidon message hash plus two scalar muls
(crates/schnorr/src/lib.rs:60-80: s*G == R + e*pk).

TPU-first redesign: verification is embarrassingly parallel, so the whole
batch runs as ONE jitted graph over N lanes:

  1. message hash     the sponge absorb/permute schedule is identical for
                      every signature (it depends only on the message
                      length), so all N transcripts run in lockstep through
                      the batched device Poseidon (ops/poseidon.py) — 8
                      permutations per signature, vectorized over N.
  2. scalar recode    t = r - e (mod r) so the check becomes
                      s*G + t*pk == R; both scalars split into 32 base-256
                      digits with the OFFSET trick: digit d is looked up as
                      (d+1)*2^(8w)*B so no table entry is the identity (the
                      correction -OFF*(G+pk), OFF = sum_w 2^(8w), is a
                      constant folded in as a final scan term).
  3. fixed-base MSM   two 32x256-entry affine tables (G and pk), ONE gather
                      of 64 packed points per lane, then a 65-step
                      lax.scan of the complete mixed-add Pallas kernel
                      (ops/pallas_mont.pmadd_pack_rows) — ~65 group adds
                      per signature instead of ~510 double-and-adds.
  4. compare          projective result (X:Y:Z) equals affine R iff
                      X == xR*Z and Y == yR*Z (Montgomery products via
                      mm_rows, canonicalized before the limb compare).

The per-signature semantics of the reference are preserved: every lane
hashes its own transcript and checks its own equation; the output is a
per-signature boolean vector, not a probabilistic batch bool.

Tables depend only on (curve, pk) and are cached; building them costs
~16k host point adds + one batched inversion, outside the timed path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Affine, CurveCfg
from . import ff, msm2, poseidon as dev_poseidon
from . import pallas_mont as pk_ops
from .ff import NLIMBS, U32

WINDOWS = 32  # base-256 digits of a <2^256 scalar
TABLE = WINDOWS * 256


# ---------------- host table construction ---------------- #


def _batch_to_affine(p: int, pjs: list[tuple]) -> list[Affine]:
    """Projective -> affine for a big list with ONE modular inversion
    (Montgomery's batched-inversion trick)."""
    prefix = []
    acc = 1
    for X, Y, Z in pjs:
        prefix.append(acc)
        acc = acc * Z % p
    inv = pow(acc, -1, p)
    out: list[Affine] = [None] * len(pjs)
    for i in range(len(pjs) - 1, -1, -1):
        X, Y, Z = pjs[i]
        zi = inv * prefix[i] % p
        inv = inv * Z % p
        out[i] = (X * zi % p, Y * zi % p)
    return out


def _table_points(cfg: CurveCfg, base: Affine) -> list[Affine]:
    """Window-major table: entry [w*256 + j] = (j+1) * 2^(8w) * base."""
    p = cfg.p
    b3 = 15 % p
    cols: list[tuple] = []
    B = (base[0], base[1], 1)
    for _ in range(WINDOWS):
        cur = B
        col = [cur]
        for _ in range(255):
            cur = msm2._pj_add(p, b3, cur, B)
            col.append(cur)
        cols.extend(col)
        B = col[255]  # 256 * 2^(8w) * base = 2^(8(w+1)) * base
    return _batch_to_affine(p, cols)


@lru_cache(maxsize=8)
def _tables_pack(cfg_name: str, pk_x: int, pk_y: int):
    """Packed Montgomery rows (16, 2*TABLE) for [G-table | pk-table] plus
    the packed correction point -OFF*(G+pk)."""
    cfg = msm2._cfg(cfg_name)
    pts = _table_points(cfg, cfg.generator) + _table_points(cfg, (pk_x, pk_y))
    pack, _ = msm2.pack_points(cfg, pts)
    off = int.from_bytes(b"\x01" * WINDOWS, "little")  # sum_w 2^(8w)
    gpk = msm2._py_add(cfg.p, cfg.generator, (pk_x, pk_y))
    from .. import native

    corr = native.msm(cfg, [off], [gpk])
    neg_corr = (corr[0], (cfg.p - corr[1]) % cfg.p)
    cpack, _ = msm2.pack_points(cfg, [neg_corr])
    return jax.device_put(pack), jax.device_put(cpack)


# ---------------- device pipeline ---------------- #


def _hash_e(fctx, V: jnp.ndarray) -> jnp.ndarray:
    """Lockstep sponge: V (N, L, 16) raw absorb values (label first) ->
    challenge field element (N, 16), canonical.

    Mirrors poseidon/sponge.py PoseidonSponge's lazy schedule for a fixed
    absorb count L: add v0/v1 into words 0/1, then permute+absorb pairs,
    then one final permute for the squeeze."""
    n, L = V.shape[0], V.shape[1]
    Vm = ff.to_mont(fctx, V.reshape(n * L, NLIMBS)).reshape(n, L, NLIMBS)
    state = jnp.zeros((n, 3, NLIMBS), U32)
    pos = 0  # absorb position
    for i in range(L):
        if pos < 2:
            state = state.at[:, pos].set(ff.add(fctx, state[:, pos], Vm[:, i]))
            pos += 1
        else:
            state = dev_poseidon.permute_batch(fctx, state)
            state = state.at[:, 0].set(ff.add(fctx, state[:, 0], Vm[:, i]))
            pos = 1
    state = dev_poseidon.permute_batch(fctx, state)
    return ff.from_mont(fctx, state[:, 0])


def _sub_const_rows(c_limbs: np.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """c - e over 16x16-bit limbs, elementwise borrow chain; requires
    c >= e (here c = r, e < p < r).  e: (N, 16) -> (N, 16)."""
    out = []
    borrow = jnp.zeros(e.shape[0], U32)
    for j in range(NLIMBS):
        d = jnp.uint32(int(c_limbs[j]) + 0x10000) - e[:, j] - borrow
        out.append(d & 0xFFFF)
        borrow = 1 - (d >> 16)
    return jnp.stack(out, axis=1)


def _digits(S: jnp.ndarray) -> jnp.ndarray:
    """(N, 16) 16-bit limbs -> (32, N) base-256 digit indices."""
    cols = []
    for w in range(WINDOWS):
        limb = S[:, w // 2]
        cols.append(((limb >> (8 * (w % 2))) & 255).astype(jnp.int32))
    return jnp.stack(cols)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _verify_jit(mctx, n: int, shift_low_bit: bool, r_limbs: tuple,
                pack, cpack, V, S, Rx, Ry):
    """Returns (ok (N,) bool, e (N,16) canonical challenge limbs)."""
    fctx = ff.ctx_for(mctx.p)
    e = _hash_e(fctx, V)
    if shift_low_bit:
        hi = jnp.concatenate([e[:, 1:], jnp.zeros((n, 1), U32)], axis=1)
        e = (e >> 1) | ((hi & 1) << 15)
    t = _sub_const_rows(r_limbs, e)

    dS = _digits(S)  # (32, N)
    dT = _digits(t)
    warr = jnp.arange(WINDOWS, dtype=jnp.int32)[:, None] * 256
    idx = jnp.concatenate([dS + warr, dT + warr + TABLE])  # (64, N)
    gathered = pack[:, idx]  # (16, 64, N)
    corr = jnp.broadcast_to(cpack[:, 0][:, None], (NLIMBS, n))
    packs = jnp.concatenate([jnp.moveaxis(gathered, 1, 0), corr[None]])  # (65,16,N)
    signs = jnp.zeros((65, 1, n), U32)

    acc0 = msm2._identity_rows(mctx, (n,))

    def body(acc, inp):
        pack_t, sign_t = inp
        return pk_ops.pmadd_pack_rows(mctx, acc, pack_t, sign_t), None

    (X, Y, Z), _ = jax.lax.scan(body, acc0, (packs, signs))

    Rx_m = jnp.transpose(ff.to_mont(fctx, Rx))  # (N,16) -> rows (16,N)
    Ry_m = jnp.transpose(ff.to_mont(fctx, Ry))
    xz = pk_ops.mm_rows(mctx, Rx_m, Z)
    yz = pk_ops.mm_rows(mctx, Ry_m, Z)
    eqs = []
    for a, b in ((X, xz), (Y, yz)):
        ca = pk_ops.canon_rows(mctx, a)
        cb = pk_ops.canon_rows(mctx, b)
        eqs.append(jnp.all(ca == cb, axis=0))
    return eqs[0] & eqs[1], e


def verify_batch(cfg: CurveCfg, pk: Affine, msgs, sigs) -> list[bool]:
    """Verify N (message, signature) pairs under one public key; returns a
    per-signature boolean list.  All messages must have the same length
    (the lockstep hash schedule depends only on it)."""
    n_req = len(sigs)
    assert n_req == len(msgs) and n_req > 0
    L = len(msgs[0])
    assert all(len(m) == L for m in msgs), "uniform message length required"
    n = max(pk_ops.BLK, -(-n_req // pk_ops.BLK) * pk_ops.BLK)

    from ..poseidon.sponge import Protocols

    label = int(Protocols.SIGNATURE) % cfg.p
    rows = []
    rx, ry, ss = [], [], []
    for i in range(n):
        m = msgs[i] if i < n_req else msgs[0]
        sig = sigs[i] if i < n_req else sigs[0]
        r_pt = sig.r if sig.r is not None else (0, 0)
        rows.append([label, pk[0] % cfg.p, pk[1] % cfg.p,
                     r_pt[0] % cfg.p, r_pt[1] % cfg.p] + [x % cfg.p for x in m])
        rx.append(r_pt[0] % cfg.p)
        ry.append(r_pt[1] % cfg.p)
        ss.append(sig.s % cfg.r)

    V = jnp.asarray(np.stack([ff.ints_to_array(r) for r in rows]), U32)
    S = jnp.asarray(ff.ints_to_array(ss), U32)
    Rx = jnp.asarray(ff.ints_to_array(rx), U32)
    Ry = jnp.asarray(ff.ints_to_array(ry), U32)
    mctx = pk_ops.mont_ctx(cfg.p, cfg.b)
    pack, cpack = _tables_pack(cfg.name, pk[0], pk[1])
    r_limbs = tuple(int(v) for v in ff.int_to_limbs(cfg.r))
    ok, _ = _verify_jit(mctx, n, cfg.r < cfg.p, r_limbs, pack, cpack,
                        V, S, Rx, Ry)
    return [bool(v) for v in np.asarray(ok[:n_req])]


def hash_message_batch(cfg: CurveCfg, pk: Affine, r_points, msgs) -> list[int]:
    """Host-tier lockstep batch of schnorr message hashes (native Poseidon
    batch permute); the CPU cross-check for _hash_e and the sign-side batch
    hasher."""
    from .. import native
    from ..poseidon.sponge import Protocols, permute

    n = len(msgs)
    L = len(msgs[0])
    label = int(Protocols.SIGNATURE) % cfg.p
    seqs = []
    for r_pt, m in zip(r_points, msgs):
        r_pt = r_pt if r_pt is not None else (0, 0)
        seqs.append([label, pk[0] % cfg.p, pk[1] % cfg.p,
                     r_pt[0] % cfg.p, r_pt[1] % cfg.p] + [x % cfg.p for x in m])

    p = cfg.p
    states = [[0, 0, 0] for _ in range(n)]

    def permute_all():
        if native.available():
            return native.poseidon_permute_batch(p, states)
        return [permute(st, p) for st in states]

    pos = 0
    for i in range(L + 5):
        if pos < 2:
            for st, sq in zip(states, seqs):
                st[pos] = (st[pos] + sq[i]) % p
            pos += 1
        else:
            states = permute_all()
            for st, sq in zip(states, seqs):
                st[0] = (st[0] + sq[i]) % p
            pos = 1
    states = permute_all()
    if cfg.r < cfg.p:
        return [st[0] >> 1 for st in states]
    return [st[0] for st in states]

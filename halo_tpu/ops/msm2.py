"""Device-tier MSM v2: scatter-free signed-digit Pippenger (the hottest
kernel; reference: arkworks `msm_unchecked` behind
crates/group/src/group.rs:48-56, SURVEY.md §2.1).

Redesigned from on-chip measurements of the round-2 implementation
(ops/msm.py), whose per-window argsort + run-scan + scatter + 256-level
tree reductions were latency- and scatter-bound (XLA scatter inside a scan
measured ~1 us/row) and whose many fused-kernel shape instantiations
dominated compile time.

Pipeline (everything on-device in ONE jitted graph, limb-rows layout):

  1. signed-digit recode   16 windows of 16 bits, digits in [-2^15, 2^15];
                           bucket key = |digit| (0 = dead), sign folded
                           into the point (negate y inside the scan kernel).
  2. sort                  one lax.sort over (16, n): key + (index|sign<<31)
                           payload -- no scatter, the sort network moves
                           only 8 bytes/element.
  3. gather                ONE gather of the packed affine SRS rows
                           (x_limb | y_limb<<16 -> 16 u32 rows/point) into
                           all 16 windows' sorted orders, chunk-major:
                           lane (w, l) owns sorted positions [l*R, (l+1)*R).
  4. prefix scan           R steps of the fused `pmadd_pack` kernel over
                           F = 16*L lanes: a PLAIN running prefix -- no
                           resets, no selects, no emit logic, no scatter.
  5. bucket sums by        bucket d occupies a contiguous sorted range
     prefix differences    [l_d, r_d]; Q_d := global-prefix[r_d] is
                           assembled from the per-lane prefix P[t, lane]
                           plus an exclusive Blelloch prefix over lane
                           totals; r_d comes from a vectorized binary
                           search over the sorted keys.
  6. Abel telescoping      sum_d d*B_d = 2^15*Q_max - sum_{d<2^15} Q_d, so
                           the per-window aggregation is ONE tree-sum of
                           the 2^15 gathered Q_d points -- no suffix scan,
                           no weighted bucket grids (dead key-0 mass
                           cancels exactly: coefficient D on both sides).
  7. window combine        the 16 window sums are pulled to host (tiny) and
                           Horner-combined in exact Python EC arithmetic.

Work: 16n mixed adds (scan) + ~1.3M adds (prefix/assembly/tree) at n=2^20,
vs 16n + scatter + 2^20 tree adds before.  No scatter anywhere; the only
data movement is one sort of 8B/element and one 64B/element gather.

Differential tests: tests/test_msm2.py (interpret mode, vs the native C++
host Pippenger).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Affine, CurveCfg
from . import ff, pallas_mont as pk
from .ff import MASK, NLIMBS, U32

C_BITS = 16  # production window width at large n


def _choose_c(n: int) -> int:
    """Window width by size: the c=16 aggregation has a ~0.3 s
    size-independent cost (2^15-bucket bisect + assembly + tree) that
    dominates small MSMs; c=8 doubles the scan work (32 windows) but its
    aggregation is ~1/256 of that.  Crossover measured around n ~ 2^18."""
    return 8 if n < (1 << 18) else 16
WINDOWS = 16
DMAX = 1 << 15  # max |digit|


def _cfg_for_c(c_bits: int):
    """(windows, dmax) for a window width; c must divide 16 (digits must
    not straddle the 16-bit limbs)."""
    assert 16 % c_bits == 0
    return 256 // c_bits, 1 << (c_bits - 1)


def available() -> bool:
    return True


# ---------------- host-side exact EC (final combine / verify) ---------------- #


def _py_add(p_mod: int, P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    (x1, y1), (x2, y2) = P, Q
    if x1 == x2 and (y1 + y2) % p_mod == 0:
        return None
    if P == Q:
        lam = (3 * x1 * x1) * pow(2 * y1, -1, p_mod) % p_mod
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p_mod) % p_mod
    x3 = (lam * lam - x1 - x2) % p_mod
    return (x3, (lam * (x1 - x3) - y1) % p_mod)


# Inversion-free host EC on projective ints (RCB complete, a=0, b=5): the
# final window combine does ~270 group ops; with affine adds each costs a
# modular inversion (~0.2 ms), with these it is ~10 us.
def _pj_add(p, b3, P, Q):
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = X1 * X2 % p
    t1 = Y1 * Y2 % p
    t2 = Z1 * Z2 % p
    t3 = ((X1 + Y1) * (X2 + Y2) - t0 - t1) % p
    t4 = ((Y1 + Z1) * (Y2 + Z2) - t1 - t2) % p
    y3 = ((X1 + Z1) * (X2 + Z2) - t0 - t2) % p
    t0 = 3 * t0 % p
    t2 = b3 * t2 % p
    z3 = (t1 + t2) % p
    t1 = (t1 - t2) % p
    y3 = b3 * y3 % p
    X3 = (t3 * t1 - t4 * y3) % p
    Y3 = (t1 * z3 + y3 * t0) % p
    Z3 = (z3 * t4 + t0 * t3) % p
    return (X3, Y3, Z3)


def _py_dbl_n(p_mod: int, P, k: int):
    if P is None or k == 0:
        return P
    b3 = 15 % p_mod
    Pj = (P[0], P[1], 1)
    for _ in range(k):
        Pj = _pj_add(p_mod, b3, Pj, Pj)
    return _pj_to_aff(p_mod, Pj)


def _pj_to_aff(p_mod: int, Pj):
    X, Y, Z = Pj
    if Z == 0:
        return None
    zi = pow(Z, -1, p_mod)
    return (X * zi % p_mod, Y * zi % p_mod)


# ---------------- device pipeline ---------------- #


def _choose_lanes(n: int) -> int:
    """Lanes per window: R = n // L scan steps; keep R in [16, 128]."""
    lanes = max(256, n // 128)
    return min(lanes, n // 16) if n >= 4096 else max(32, n // 16)


def _recode_signed(K_rows: jnp.ndarray, c_bits: int):
    """K_rows (16, n) canonical scalar limbs -> signed window digits:
    (keys (W, n) in [0, 2^(c-1)], sign (W, n) in {0,1})."""
    windows, dmax = _cfg_for_c(c_bits)
    per_limb = 16 // c_bits
    cmask = (1 << c_bits) - 1
    keys = []
    signs = []
    carry = jnp.zeros(K_rows.shape[1:], U32)
    for w in range(windows):
        raw = (K_rows[w // per_limb] >> ((w % per_limb) * c_bits)) & cmask
        t = raw + carry
        ge = t >= dmax
        mag = jnp.where(ge, (1 << c_bits) - t, t)  # |digit|; t = 2^c -> 0
        keys.append(mag)
        signs.append(ge.astype(U32))
        carry = ge.astype(U32)
    return jnp.stack(keys), jnp.stack(signs)


def _bisect_right(keys_sorted: jnp.ndarray, queries: jnp.ndarray, n: int):
    """Vectorized per-window binary search: for each (w, q) the number of
    sorted keys[w] <= q.  keys_sorted (W, n); queries (q,) -> (W, q)."""
    W = keys_sorted.shape[0]
    q = queries.shape[0]
    lo = jnp.zeros((W, q), jnp.int32)
    hi = jnp.full((W, q), n, jnp.int32)
    warr = jnp.arange(W, dtype=jnp.int32)[:, None]
    qa = jnp.broadcast_to(queries[None, :], (W, q))
    steps = int(n).bit_length()
    for _ in range(steps):
        upd = lo < hi
        mid = (lo + hi) >> 1  # < n whenever lo < hi
        kv = keys_sorted[warr, jnp.minimum(mid, n - 1)]
        go = upd & (kv <= qa)
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(upd & ~go, mid, hi)
    return lo  # count of keys <= q


def _bisect_right2(keys_sorted: jnp.ndarray, queries: jnp.ndarray, n: int):
    """Two-level variant of _bisect_right: a coarse pass over every 64th
    query bounds each query's search interval (counts are monotone in the
    query), then the refinement runs ~log2(n) masked rounds on narrowed
    intervals -- same result, fewer full-width gather rounds."""
    q = queries.shape[0]
    stride = 64
    if q <= 2 * stride:
        return _bisect_right(keys_sorted, queries, n)
    coarse_q = queries[::stride]
    coarse = _bisect_right(keys_sorted, coarse_q, n)  # (W, ceil(q/64))
    W = keys_sorted.shape[0]
    idx = jnp.arange(q, dtype=jnp.int32)
    ci = idx // stride
    lo = coarse[:, ci]  # count(block's first query) <= count(q)
    upper = jnp.concatenate([coarse[:, 1:], jnp.full((W, 1), n, jnp.int32)], axis=1)
    hi = upper[:, ci]  # count(next block's first query) >= count(q)
    warr = jnp.arange(W, dtype=jnp.int32)[:, None]
    qa = jnp.broadcast_to(queries[None, :], (W, q)).astype(U32)
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)
    for _ in range(int(n).bit_length()):
        upd = lo < hi
        mid = (lo + hi) >> 1
        kv = keys_sorted[warr, jnp.minimum(mid, n - 1)]
        go = upd & (kv <= qa)
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(upd & ~go, mid, hi)
    return lo


def _bucket_cum_counts(keys, windows: int, dmax: int, n: int):
    """cnt[w, d] = #{i : keys[w, i] <= d} for d in [0, dmax] — the bucket
    boundary positions — via a hi-byte/lo-byte one-hot MXU histogram +
    cumsum.  Replaces the vectorized bisection (round-4 on-chip ablation:
    140 ms -> 34 ms at n=2^20, c=16).  Exact: counts <= n < 2^24 in f32;
    one-hot entries are 0/1 so bf16 MXU passes are exact too."""
    assert n < (1 << 24)
    n_hi = (dmax >> 8) + 1
    chunk = min(n, 1 << 16)
    hi_ar = jnp.arange(n_hi, dtype=U32)
    lo_ar = jnp.arange(256, dtype=U32)
    counts = jnp.zeros((windows, n_hi * 256), jnp.float32)
    for c0 in range(0, n, chunk):
        kc = keys[:, c0:c0 + chunk]
        acc = []
        for w in range(windows):
            hi = kc[w] >> 8
            lo = kc[w] & 255
            A = (hi[None, :] == hi_ar[:, None]).astype(jnp.float32)
            Bm = (lo[None, :] == lo_ar[:, None]).astype(jnp.float32)
            cg = jax.lax.dot_general(A, Bm, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc.append(cg.reshape(-1))
        counts = counts + jnp.stack(acc)
    cum = jnp.cumsum(counts, axis=1)
    return cum[:, :dmax + 1].astype(jnp.int32)


def _identity_rows(mctx: pk.MontCtx, shape):
    r1 = ff.int_to_limbs((1 << 256) % mctx.p)
    X = jnp.zeros((NLIMBS, *shape), U32)
    Y = jnp.broadcast_to(jnp.asarray(r1, U32).reshape(NLIMBS, *(1,) * len(shape)),
                         (NLIMBS, *shape))
    Z = jnp.zeros((NLIMBS, *shape), U32)
    return (X, Y, Z)


def _pad_call(fn, mctx, parts, batch_axes_shape, n_pad_to=pk.BLK):
    """Flatten trailing batch axes of each (16, ...) array, pad the flat
    batch to a BLK multiple, call fn, restore shape."""
    flat = [c.reshape(NLIMBS, -1) for c in parts]
    n = flat[0].shape[1]
    npad = max(n_pad_to, ((n + n_pad_to - 1) // n_pad_to) * n_pad_to)
    if npad != n:
        flat = [jnp.concatenate([c, jnp.zeros((NLIMBS, npad - n), U32)], axis=1) for c in flat]
    out = fn(flat)
    return tuple(o[:, :n].reshape(NLIMBS, *batch_axes_shape) for o in out)


def _padd_shaped(mctx, P, Q):
    shape = P[0].shape[1:]
    return _pad_call(lambda flat: pk.padd_rows(mctx, flat[:3], flat[3:]),
                     mctx, [*P, *Q], shape)


def _pmadd_pack_shaped(mctx, P, pack, sign):
    """Masked-boundary mixed add on shaped operands: P tuple of (16, ...),
    pack (16, ...) packed affine rows, sign (...) 0/1.  Pad lanes carry
    garbage affine data; complete formulas make that safe (outputs of pad
    lanes are discarded by the caller)."""
    shape = P[0].shape[1:]
    flat = [c.reshape(NLIMBS, -1) for c in (*P, pack)]
    sflat = sign.reshape(1, -1).astype(U32)
    n = flat[0].shape[1]
    npad = max(pk.BLK, -(-n // pk.BLK) * pk.BLK)
    if npad != n:
        flat = [jnp.concatenate([c, jnp.zeros((NLIMBS, npad - n), U32)], axis=1)
                for c in flat]
        sflat = jnp.concatenate([sflat, jnp.zeros((1, npad - n), U32)], axis=1)
    out = pk.pmadd_pack_rows(mctx, tuple(flat[:3]), flat[3], sflat)
    return tuple(o[:, :n].reshape(NLIMBS, *shape) for o in out)


def _tree_sum(mctx, P, axis_len: int):
    """Sum a tuple of (16, W, m) points over the last axis via halvings."""
    cur = P
    m = axis_len
    while m > 1:
        half = m // 2
        odd = m - 2 * half
        left = tuple(c[..., :half] for c in cur)
        right = tuple(c[..., half:2 * half] for c in cur)
        s = _padd_shaped(mctx, left, right)
        if odd:
            cur = tuple(jnp.concatenate([sc, c[..., 2 * half:]], axis=-1)
                        for sc, c in zip(s, cur))
            m = half + 1
        else:
            cur = s
            m = half
    return cur


def _excl_prefix(mctx, T, L: int):
    """Exclusive Blelloch prefix over the last axis of (16, W, L) points."""
    # upsweep: levels of pairwise sums
    levels = [T]
    cur = T
    m = L
    while m > 1:
        resh = tuple(c.reshape(NLIMBS, -1, m // 2, 2) for c in cur)
        left = tuple(c[..., 0] for c in resh)
        right = tuple(c[..., 1] for c in resh)
        cur = _padd_shaped(mctx, left, right)
        levels.append(cur)
        m //= 2
    # downsweep: exclusive prefix
    E = _identity_rows(mctx, cur[0].shape[1:])  # (16, W, 1)
    for lvl in reversed(levels[:-1]):
        m2 = lvl[0].shape[-1]
        left_in = tuple(c[..., 0::2] for c in lvl)
        odd = _padd_shaped(mctx, E, left_in)  # E[2m+1] = E_up[m] + S[2m]
        # interleave: E_new[2m] = E[m], E_new[2m+1] = odd[m]
        E = tuple(jnp.stack([e, o], axis=-1).reshape(NLIMBS, -1, m2)
                  for e, o in zip(E, odd))
    return E


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4), static_argnames=("stride",))
def _msm2_multi(mctx: pk.MontCtx, n: int, lanes: int, c_bits: int, skip: int,
                xy_pack: jnp.ndarray, K_multi: jnp.ndarray, *, stride: int = 1):
    """Batched full device pipeline: K_multi (k, 16, n) canonical scalar
    rows, ONE sort/gather/scan/aggregate dispatch for all k MSMs over the
    SAME point pack (their windows simply stack: kW total).  Returns
    (16, k*W, 2) aggregates [sum_{d<dmax} Q_d, Q_top] per window.

    `skip` (static): drop the first `skip` sorted lanes of every window
    before the scan.  Callers must guarantee >= skip zero-digit lanes per
    window (e.g. the IPA fold's masked halves: every window of a scalar
    vector that is zero outside an n/2 support has >= n/2 zero keys, which
    sort to the front).  This makes an L/R fold round ONE half-work
    dispatch instead of two compacted MSMs with index gathers.

    `stride` (static): fold `stride` sorted points per scan step.  Each
    scan step costs ~1.5 ms of fixed dispatch latency on-chip regardless
    of lane width (round-5 profile: the IPA fold round was 100 ms of scan
    for 6 ms of everything else), so striding cuts the dominant cost by
    ~stride at the price of (stride - 1) small masked fix-up adds at the
    bucket boundaries (the scan then only materializes every stride-th
    prefix, which also divides the P_all HBM write traffic)."""
    windows, dmax = _cfg_for_c(c_bits)
    k = K_multi.shape[0]
    W2 = k * windows
    n_live = n - skip
    L = lanes
    R = n_live // L
    F = W2 * L
    S = stride if stride > 1 and R % stride == 0 else 1

    ks_list, sg_list = [], []
    for i in range(k):
        ke, si = _recode_signed(K_multi[i], c_bits)
        ks_list.append(ke)
        sg_list.append(si)
    keys = jnp.concatenate(ks_list)   # (kW, n)
    signs = jnp.concatenate(sg_list)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=U32)[None, :], (W2, n))
    idxsign = idx | (signs << 31)
    keys_s, idxsign_s = jax.lax.sort((keys, idxsign), dimension=1, num_keys=1)
    if skip:
        keys_s = keys_s[:, skip:]
        idxsign_s = idxsign_s[:, skip:]
    perm = (idxsign_s & 0x7FFFFFFF).astype(jnp.int32)
    sign_s = idxsign_s >> 31  # (kW, n_live)

    # chunk-major rearrange: lane (w, l) owns sorted positions [l*R, (l+1)*R)
    gidx = perm.reshape(W2, L, R).transpose(2, 0, 1)  # (R, W2, L)
    sgn = sign_s.reshape(W2, L, R).transpose(2, 0, 1).reshape(R, 1, F)

    gathered = xy_pack[:, gidx]  # (16, R, W2, L)
    gathered = jnp.moveaxis(gathered, 1, 0).reshape(R, NLIMBS, F)

    # prefix scan: running mixed-add folding S sorted points per step,
    # emitting every S-th (inclusive) prefix
    acc0 = _identity_rows(mctx, (F,))

    if S == 1:
        def body(acc, inp):
            pack_t, sign_t = inp
            acc = pk.pmadd_pack_rows(mctx, acc, pack_t, sign_t)
            return acc, acc

        accT, P_sup = jax.lax.scan(body, acc0, (gathered, sgn))
    else:
        gS = gathered.reshape(R // S, S, NLIMBS, F)
        sS = sgn.reshape(R // S, S, 1, F)

        def body(acc, inp):
            packs, signs = inp
            for j in range(S):
                acc = pk.pmadd_pack_rows(mctx, acc, packs[j], signs[j])
            return acc, acc

        accT, P_sup = jax.lax.scan(body, acc0, (gS, sS))
    # P_sup: tuple of (R/S, 16, F) prefixes at positions S-1, 2S-1, ...;
    # accT: lane totals (16, F)

    # exclusive prefix over lanes within each window
    T = tuple(c.reshape(NLIMBS, W2, L) for c in accT)
    Lx = _excl_prefix(mctx, T, L)  # (16, W2, L)

    # bucket boundary positions within the live slice: r_d = (# live keys
    # <= d) - 1.  MXU histogram for the big c=16 bucket space; batched
    # bisection for small dmax (its gather volume is tiny there and it
    # avoids a kW-way unrolled histogram loop).
    if dmax > 512:
        cnt = _bucket_cum_counts(keys_s, W2, dmax, n_live)  # (W2, dmax+1)
    else:
        qs = jnp.arange(dmax + 1, dtype=U32)
        cnt = _bisect_right2(keys_s, qs, n_live)
    r = cnt - 1
    valid = r >= 0
    rc = jnp.maximum(r, 0)
    lq = rc // R
    tq = rc % R

    warr = jnp.arange(W2, dtype=jnp.int32)[:, None]
    colq = warr * L + lq  # (W2, q)
    if S == 1:
        Pg = tuple(jnp.moveaxis(c[tq, :, colq], -1, 0) for c in P_sup)  # (16, W2, q)
    else:
        # inclusive prefix at sorted position tq = last full super-step's
        # emitted prefix + up to S-1 masked fix-up adds of the skipped points
        ns = (tq + 1) // S       # completed super-steps
        rem = (tq + 1) % S
        supq = jnp.maximum(ns - 1, 0)
        Pg = tuple(jnp.moveaxis(c[supq, :, colq], -1, 0) for c in P_sup)
        identq = _identity_rows(mctx, Pg[0].shape[1:])
        has_base = ns >= 1
        Pg = tuple(jnp.where(has_base[None], pc, ic) for pc, ic in zip(Pg, identq))
        permWLR = perm.reshape(W2, L, R)
        signWLR = sign_s.reshape(W2, L, R)
        base_pos = ns * S
        for j in range(S - 1):
            posq = jnp.minimum(base_pos + j, R - 1)
            idxf = permWLR[warr, lq, posq]   # (W2, q) original point index
            packs = xy_pack[:, idxf]         # (16, W2, q)
            sgf = signWLR[warr, lq, posq]
            added = _pmadd_pack_shaped(mctx, Pg, packs, sgf)
            usej = j < rem
            Pg = tuple(jnp.where(usej[None], ac, pc) for ac, pc in zip(added, Pg))
    Lxg = tuple(c[:, warr, lq] for c in Lx)  # (16, W2, q)
    Q = _padd_shaped(mctx, Lxg, Pg)
    ident = _identity_rows(mctx, Q[0].shape[1:])
    Q = tuple(jnp.where(valid[None], q, i) for q, i in zip(Q, ident))

    Qsum = _tree_sum(mctx, tuple(c[..., :dmax] for c in Q), dmax)  # (16, W2, 1)
    Qtop = tuple(c[..., dmax:] for c in Q)  # (16, W2, 1) = window totals
    return tuple(jnp.concatenate([s, t], axis=-1) for s, t in zip(Qsum, Qtop))


def _msm2_device(mctx: pk.MontCtx, n: int, lanes: int, c_bits: int,
                 xy_pack: jnp.ndarray, K_rows: jnp.ndarray, stride: int = 1):
    """Single-MSM pipeline; returns (16, W, 2) [sum_{d<dmax} Q_d, Q_top]."""
    return _msm2_multi(mctx, n, lanes, c_bits, 0, xy_pack, K_rows[None],
                       stride=stride)


# ---------------- host orchestration ---------------- #


@lru_cache(maxsize=8)
def _srs_pack(cfg_name: str, n: int):
    """Packed Montgomery affine SRS rows (16, n): x_limb | (y_limb << 16)."""
    from ..srs import load_srs

    pp = load_srs(cfg_name, n)
    cfg = _cfg(cfg_name)
    fctx = ff.ctx_for(cfg.p)
    x = ff.to_mont_jit(fctx, jnp.asarray(pp.gs_x[:n], U32))
    y = ff.to_mont_jit(fctx, jnp.asarray(pp.gs_y[:n], U32))
    return jax.device_put(jnp.transpose(x | (y << 16)))


def _cfg(name: str) -> CurveCfg:
    from ..curves import PALLAS, VESTA

    return PALLAS if name == "pallas" else VESTA


def pack_points(cfg: CurveCfg, points: list[Affine]) -> tuple:
    """Host affine ints -> (packed rows (16, n), inf mask (n,))."""
    fctx = ff.ctx_for(cfg.p)
    # infinity -> generator placeholder (digit forced to 0 so it never counts)
    gx, gy = cfg.p - 1, 2  # (-1, 2) is on both Pasta curves (y^2 = x^3 + 5)
    xs = ff.ints_to_array([gx if pt is None else pt[0] for pt in points])
    ys = ff.ints_to_array([gy if pt is None else pt[1] for pt in points])
    x = ff.to_mont_jit(fctx, jnp.asarray(xs, U32))
    y = ff.to_mont_jit(fctx, jnp.asarray(ys, U32))
    inf = np.array([pt is None for pt in points])
    return jnp.transpose(x | (y << 16)), inf


def _scalars_rows(cfg: CurveCfg, scalars: list[int], inf_mask=None) -> jnp.ndarray:
    ks = [s % cfg.r for s in scalars]
    if inf_mask is not None:
        ks = [0 if m else k for k, m in zip(ks, inf_mask)]
    return jnp.transpose(jnp.asarray(ff.ints_to_array(ks), U32))


def _combine_host(cfg: CurveCfg, S_rows, c_bits: int) -> Affine:
    """Pull the (16, W, 2) [sum Q_d, Q_top] points, finish in exact host EC:
    W_w = dmax * Q_top - sum Q_d;  total = sum_w 2^(c*w) * W_w."""
    windows, _ = _cfg_for_c(c_bits)
    p_mod = cfg.p
    arrs = [np.asarray(c) for c in S_rows]  # (16, W, 2) x 3

    b3 = 15 % p_mod

    def to_pj(w, j):
        limbs = [int(ff.limbs_to_int(arrs[k][:, w, j])) for k in range(3)]
        return tuple(v % p_mod for v in limbs)  # Montgomery factors cancel in x/z, y/z

    total = (0, 1, 0)
    for w in reversed(range(windows)):
        qsum, qtop = to_pj(w, 0), to_pj(w, 1)
        for _ in range(c_bits):
            total = _pj_add(p_mod, b3, total, total)
        Ww = qtop
        for _ in range(c_bits - 1):
            Ww = _pj_add(p_mod, b3, Ww, Ww)
        neg = (qsum[0], (p_mod - qsum[1]) % p_mod, qsum[2])
        Ww = _pj_add(p_mod, b3, Ww, neg)
        total = _pj_add(p_mod, b3, total, Ww)
    return _pj_to_aff(p_mod, total)


def msm2_srs(cfg: CurveCfg, scalars: list[int], c_bits: int | None = None) -> Affine:
    """MSM against the first len(scalars) SRS generators (device v2 path)."""
    n_req = len(scalars)
    n = max(4096, 1 << (n_req - 1).bit_length())
    c_bits = c_bits or _choose_c(n)
    mctx = pk.mont_ctx(cfg.p, cfg.b)
    xy = _srs_pack(cfg.name, n)
    ks = scalars + [0] * (n - n_req)
    K = _scalars_rows(cfg, ks)
    lanes = _choose_lanes(n)
    S = _msm2_device(mctx, n, lanes, c_bits, xy, K)
    return _combine_host(cfg, S, c_bits)


def msm2_srs_rows(cfg: CurveCfg, K_rows, n_req: int,
                  c_bits: int | None = None) -> Affine:
    """SRS MSM with DEVICE-resident canonical scalar limb rows (16, n_req)
    -- the prover's commit path (no host round-trip of the coefficients
    through the slow tunnel)."""
    import jax.numpy as jnp

    n = max(4096, 1 << (n_req - 1).bit_length())
    c_bits = c_bits or _choose_c(n)
    mctx = pk.mont_ctx(cfg.p, cfg.b)
    xy = _srs_pack(cfg.name, n)
    if n_req != n:
        K_rows = jnp.concatenate(
            [K_rows, jnp.zeros((NLIMBS, n - n_req), K_rows.dtype)], axis=1)
    lanes = _choose_lanes(n)
    S = _msm2_device(mctx, n, lanes, c_bits, xy, K_rows)
    return _combine_host(cfg, S, c_bits)


def msm2_srs_rows_multi(cfg: CurveCfg, K_batch, n_req: int,
                        c_bits: int | None = None) -> list[Affine]:
    """k SRS MSMs in ONE pipeline dispatch: K_batch (k, 16, n_req)
    device-resident canonical scalar rows.  The prover's 16 w-polys /
    16 t-chunks commit in a single sort/gather/scan instead of 16
    sequential MSM dispatches."""
    k = K_batch.shape[0]
    n = max(4096, 1 << (n_req - 1).bit_length())
    c_bits = c_bits or _choose_c(n)
    windows, _ = _cfg_for_c(c_bits)
    mctx = pk.mont_ctx(cfg.p, cfg.b)
    xy = _srs_pack(cfg.name, n)
    if n_req != n:
        K_batch = jnp.concatenate(
            [K_batch, jnp.zeros((k, NLIMBS, n - n_req), K_batch.dtype)], axis=2)
    lanes = _choose_lanes(n)
    # HBM cap: the pipeline's prefix/gather tensors cost ~280 bytes per
    # (window, lane), independent of the R/L split — at 2^16 x 16 polys
    # that is ~9 GB and OOMs the 16 GB chip mid-prover.  Sub-batch so one
    # dispatch stays under ~3.5 GB.
    k_max = max(1, int(3.5e9 / (280 * windows * n)))
    n_chunks = -(-k // k_max)
    k_max = -(-k // n_chunks)  # even-ish chunks -> fewer compiled shapes
    outs = []
    for j0 in range(0, k, k_max):
        sub = K_batch[j0:j0 + k_max]
        S = jax.device_get(_msm2_multi(mctx, n, lanes, c_bits, 0, xy, sub))
        outs.extend(_combine_host(
            cfg, tuple(c[:, i * windows:(i + 1) * windows] for c in S), c_bits)
            for i in range(sub.shape[0]))
    return outs


def msm2(cfg: CurveCfg, scalars: list[int], points: list[Affine],
         c_bits: int | None = None, min_n: int = 4096) -> Affine:
    """General MSM over explicit points (device v2 path)."""
    n_req = len(scalars)
    if n_req == 0:
        return None
    n = max(min_n, 1 << (n_req - 1).bit_length())
    c_bits = c_bits or _choose_c(n)
    mctx = pk.mont_ctx(cfg.p, cfg.b)
    pts = list(points[:n_req]) + [None] * (n - n_req)
    xy, inf = pack_points(cfg, pts)
    ks = list(scalars) + [0] * (n - n_req)
    K = _scalars_rows(cfg, ks, inf)
    lanes = _choose_lanes(n)
    S = _msm2_device(mctx, n, lanes, c_bits, jax.device_put(xy), K)
    return _combine_host(cfg, S, c_bits)

"""Device-tier multi-scalar multiplication (the hottest kernel, SURVEY §2.1).

TPU-first Pippenger (SURVEY.md §7.4 hard part #2: no data-dependent scatter
with custom combine on TPU):

  per 16-bit window:
    1. digits = scalar limb w                (vectorized bitfield)
    2. stable sort points by digit           (XLA sort + gather)
    3. bucket accumulation: the sorted array is cut into C contiguous
       lane-chunks; a lax.scan walks the R=N/C rows, keeping one running
       partial per lane (reset at run starts).  Completed runs that start
       and end inside a chunk are scattered straight into the bucket array
       (digits are unique per step, so scatter-set is conflict-free).
       Runs crossing chunk boundaries leave <=2 partials per chunk which a
       short second scan merges in chunk order.
    4. window sum = sum_d d*B_d, computed as a batched 16-bit scalar-mul
       over the bucket array + tree reduction (log-depth, branchless).
  total = Horner over windows: T <- 16 doublings + window sum.

Work is O(N) point-adds per window like serial Pippenger; depth is
R + 2C + log-terms, fully vectorized across lanes.  The multi-chip variant
shards points and ring-reduces bucket partials (halo_tpu/parallel/msm.py).

The naive path (batched double-and-add + tree reduce) is kept for small n
and as a differential cross-check.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Affine, CurveCfg
from . import ec, ff
from .ec import ECCtx, Point
from .ff import NLIMBS, U32

OVF = 1 << 16  # overflow bucket slot for masked scatters


def available() -> bool:
    return True


def _wide_schedule() -> bool:
    """Pick the reduction schedule by backend.

    Accelerators get log-depth reductions (tree halvings, associative scan):
    sequential-step latency dominates there, and with the heavy limb math
    living in cached Pallas kernels the extra graph-shape instantiations are
    cheap to compile.  XLA *CPU* (the CI backend) is the opposite: each
    ec.add instantiation is a giant jnp graph that takes minutes to compile,
    so CI keeps the few-instantiation sequential lax.scan schedule.  Both
    schedules compute identical bucket sums (differential tests run the CPU
    one; the bench verifies the accelerator one against the native host MSM
    in-run).  HALO_TPU_WIDE_SCHEDULE=0/1 overrides (e.g. to differential-
    test the accelerator schedule on the CPU mesh)."""
    env = os.environ.get("HALO_TPU_WIDE_SCHEDULE")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "cpu"


# ---------------- SRS device cache ---------------- #


@lru_cache(maxsize=8)
def _srs_device(cfg_name: str, n: int) -> Point:
    from ..srs import load_srs

    pp = load_srs(cfg_name, n)
    cfg = _cfg(cfg_name)
    return ec.from_limbs_canonical(ec.ec_ctx(cfg), pp.gs_x[:n], pp.gs_y[:n])


def _cfg(name: str) -> CurveCfg:
    from ..curves import PALLAS, VESTA

    return PALLAS if name == "pallas" else VESTA


# ---------------- naive MSM ---------------- #


def msm_naive(ctx: ECCtx, P: Point, scalars: jnp.ndarray) -> Point:
    """Batched double-and-add + tree reduce; O(255 N) adds, small graph."""
    prods = ec.scalar_mul(ctx, P, scalars)
    return ec.tree_reduce(ctx, prods)


msm_naive_jit = jax.jit(msm_naive, static_argnums=0)


# ---------------- Pippenger ---------------- #


def _bucket_accumulate(ctx: ECCtx, pts_sorted: Point, keys: jnp.ndarray, lanes: int, wide: bool) -> Point:
    """Bucket sums B[d] for sorted (point, key) arrays; returns (2^16+1, 16) arrays."""
    n = keys.shape[0]
    assert n % lanes == 0
    rows = n // lanes

    # chunk-major layout: lane j owns sorted elements [j*rows, (j+1)*rows)
    def to_grid(x):
        return x.reshape(lanes, rows, *x.shape[1:]).swapaxes(0, 1)  # (rows, lanes, ...)

    keys_g = to_grid(keys)
    pts_g = tuple(to_grid(c) for c in pts_sorted)

    key_prev = jnp.concatenate([jnp.full((1,), OVF + 1, U32), keys[:-1]])
    key_next = jnp.concatenate([keys[1:], jnp.full((1,), OVF + 1, U32)])
    run_start = to_grid((keys != key_prev).astype(jnp.bool_))
    run_end = to_grid((keys != key_next).astype(jnp.bool_))
    # head_run: positions in a run that began in an earlier chunk
    head_run = jnp.cumsum(run_start.astype(U32), axis=0) == 0

    B0 = ec.identity(ctx, (OVF + 1,))
    acc0 = ec.identity(ctx, (lanes,))
    head0 = ec.identity(ctx, (lanes,))

    def body(state, inp):
        acc, head, B = state
        pt, key, start, end, is_head = inp
        acc = ec.select(start, pt, ec.add(ctx, acc, pt))
        emit = end & ~is_head
        idx = jnp.where(emit, key, OVF)
        B = tuple(b.at[idx].set(a) for b, a in zip(B, acc))
        # capture the head-run closing partial (at most once per lane)
        capture = end & is_head
        head = ec.select(capture, acc, head)
        return (acc, head, B), None

    (acc_f, head_f, B), _ = jax.lax.scan(
        body, (acc0, head0, B0), (pts_g, keys_g, run_start, run_end, head_run)
    )

    # ---- merge cross-chunk partials (<=2 per lane) in chunk order ---- #
    first_key = keys_g[0]  # (lanes,)
    last_key = keys_g[-1]
    head_valid = jnp.any(run_end & head_run, axis=0)  # head piece captured
    tail_valid = ~run_end[-1]  # last run continues into next chunk

    ident1 = ec.identity(ctx)
    # piece sequence per lane: [head piece, tail piece]
    def piece(valid, pt_arr, key_arr, closer):
        p = tuple(jnp.where(valid[..., None], c, jnp.broadcast_to(i, c.shape)) for c, i in zip(pt_arr, ident1))
        return p, key_arr, closer & valid

    head_piece = piece(head_valid, head_f, first_key, jnp.ones_like(head_valid))
    tail_piece = piece(tail_valid, acc_f, last_key, jnp.zeros_like(tail_valid))

    def interleave(a, b):
        return jnp.stack([a, b], axis=1).reshape(-1, *a.shape[1:])

    seq_pts = tuple(interleave(h, t) for h, t in zip(head_piece[0], tail_piece[0]))
    seq_keys = interleave(head_piece[1], tail_piece[1])
    seq_close = interleave(head_piece[2], tail_piece[2])

    if wide:
        # Segmented inclusive sum over the 2*lanes piece sequence, log-depth.
        # Pieces of one run are contiguous and share its (globally unique)
        # key, so segment starts are key changes; the run's full sum lands at
        # its closing piece (the head piece of the lane where the run ends),
        # and the per-run scatter keys are distinct => conflict-free scatter.
        # (A sequential merge scan is 2*lanes dependent steps of single point
        # adds — the dominant latency at production sizes.)
        seg_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), seq_keys[1:] != seq_keys[:-1]]
        )

        def seg_combine(a, b):
            pa, fa = a
            pb, fb = b
            merged = ec.select(fb, pb, ec.add(ctx, pa, pb))
            return (merged, fa | fb)

        run_sums, _ = jax.lax.associative_scan(seg_combine, (seq_pts, seg_start))
        idx = jnp.where(seq_close, seq_keys, OVF)
        B = tuple(b.at[idx].set(r) for b, r in zip(B, run_sums))
        return B

    # CPU/CI schedule: one sequential merge scan (a single add-graph
    # instantiation keeps XLA CPU compile time sane; see _wide_schedule).
    def merge_body(state, inp):
        running, cur_key, B = state
        pt, key, close = inp
        same = key == cur_key
        running = ec.select(jnp.asarray(same), ec.add(ctx, running, pt), pt)
        idx = jnp.where(close, key, OVF)
        B = tuple(b.at[idx].set(r) for b, r in zip(B, running))
        return (running, key, B), None

    (_, _, B), _ = jax.lax.scan(
        merge_body, (ident1, jnp.asarray(OVF + 1, U32), B), (seq_pts, seq_keys, seq_close)
    )
    return B


def scan_sum(ctx: ECCtx, P: Point) -> Point:
    """Sum a (N,) point batch with two fixed-shape lax.scans (O(N) work,
    sqrt-ish depth, only two add-graph instantiations — compile-friendly)."""
    n = P[0].shape[0]
    k = 1
    while k * k < n:
        k *= 2
    m = -(-n // k)
    pad = k * m - n
    if pad:
        idp = ec.identity(ctx, (pad,))
        P = tuple(jnp.concatenate([c, i]) for c, i in zip(P, idp))
    grid = tuple(c.reshape(k, m, NLIMBS) for c in P)

    def row_body(acc, row):
        return ec.add(ctx, acc, row), None

    acc_row, _ = jax.lax.scan(row_body, ec.identity(ctx, (m,)), grid)

    def col_body(acc, x):
        return ec.add(ctx, acc, x), None

    total, _ = jax.lax.scan(col_body, ec.identity(ctx), acc_row)
    return total


def _tree_reduce_axis0(ctx: ECCtx, P: Point) -> Point:
    """Reduce a (k, ..., 16) point batch over axis 0 in log2(k) halvings
    (k a power of two).  Each level is one wide batched add — log-depth
    instead of a k-step sequential scan."""
    while P[0].shape[0] > 1:
        h = P[0].shape[0] // 2
        P = ec.add(ctx, tuple(c[:h] for c in P), tuple(c[h:] for c in P))
    return tuple(c[0] for c in P)


def _weighted_sum_256(ctx: ECCtx, P: Point, wide: bool) -> Point:
    """sum_a a * P[a] for a 256-point batch (8-bit double-and-add + tree)."""
    digits = jnp.arange(256, dtype=U32)

    def body(i, state):
        acc, base = state
        bit = (digits >> i) & 1
        acc = ec.select(bit == 1, ec.add(ctx, acc, base), acc)
        base = ec.double(ctx, base)
        return acc, base

    weighted, _ = jax.lax.fori_loop(0, 8, body, (ec.identity(ctx, (256,)), P))
    if wide:
        return _tree_reduce_axis0(ctx, weighted)
    return scan_sum(ctx, weighted)


def _window_sum(ctx: ECCtx, B: Point, wide: bool) -> Point:
    """sum_d d*B[d] over 2^16 buckets, d = hi*256 + lo:
    256 * sum_a a*R_a + sum_b b*C_b with R/C the row/col sums of the
    (256, 256)-reshaped bucket grid, each reduced in 8 log-depth levels."""
    grid = tuple(c[: 1 << 16].reshape(256, 256, NLIMBS) for c in B)
    grid_t = tuple(c.swapaxes(0, 1) for c in grid)

    if wide:
        col_sums = _tree_reduce_axis0(ctx, grid)  # reduce over hi -> C_lo
        row_sums = _tree_reduce_axis0(ctx, grid_t)  # reduce over lo -> R_hi
    else:

        def row_red(acc, row):
            return ec.add(ctx, acc, row), None

        col_sums, _ = jax.lax.scan(row_red, ec.identity(ctx, (256,)), grid)
        row_sums, _ = jax.lax.scan(row_red, ec.identity(ctx, (256,)), grid_t)

    w_hi = _weighted_sum_256(ctx, row_sums, wide)
    w_lo = _weighted_sum_256(ctx, col_sums, wide)

    def dbl(_, t):
        return ec.double(ctx, t)

    return ec.add(ctx, jax.lax.fori_loop(0, 8, dbl, w_hi), w_lo)


def _pippenger_impl(ctx: ECCtx, P: Point, scalars: jnp.ndarray, lanes: int,
                    wide: bool | None = None) -> Point:
    if wide is None:  # non-jit convenience; jit callers pass it explicitly
        wide = _wide_schedule()
    def window_body(i, total):
        w = NLIMBS - 1 - i  # high window first
        digits = scalars[:, w].astype(U32)
        order = jnp.argsort(digits)
        keys = digits[order]
        pts_sorted = tuple(c[order] for c in P)
        B = _bucket_accumulate(ctx, pts_sorted, keys, lanes, wide)
        S = _window_sum(ctx, B, wide)

        def dbl(_, t):
            return ec.double(ctx, t)

        total = jax.lax.fori_loop(0, 16, dbl, total)
        return ec.add(ctx, total, S)

    return jax.lax.fori_loop(0, NLIMBS, window_body, ec.identity(ctx))


pippenger_jit = jax.jit(_pippenger_impl, static_argnums=(0, 3, 4))


def _use_v2(n: int) -> bool:
    """Route to the v2 sort+prefix-scan Pippenger (ops/msm2.py) on
    accelerator backends; the v1 path remains the CPU/CI implementation
    (v2's pallas kernels only run interpreted there)."""
    env = os.environ.get("HALO_TPU_MSM_V2")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "cpu" and n >= 2048


def msm(cfg: CurveCfg, scalars: list[int], points: list[Affine]) -> Affine:
    """Host-facing MSM: python ints/affines in, affine out."""
    n = len(scalars)
    if n == 0:
        return None
    if _use_v2(n):
        from . import msm2

        return msm2.msm2(cfg, scalars, points)
    ctx = ec.ec_ctx(cfg)
    P = ec.from_affine_ints(ctx, points[:n])
    return _msm_device(ctx, P, scalars)


def msm_srs(cfg: CurveCfg, scalars: list[int]) -> Affine:
    """MSM against the first len(scalars) SRS generators."""
    n = len(scalars)
    if n == 0:
        return None
    if _use_v2(n):
        from . import msm2

        return msm2.msm2_srs(cfg, scalars)
    size = max(4, 1 << (n - 1).bit_length())
    ctx = ec.ec_ctx(cfg)
    P = _srs_device(cfg.name, size)
    P = tuple(c[:n] for c in P)
    return _msm_device(ctx, P, scalars)


def default_lanes(n: int) -> int:
    """Bucket-accumulation width: wide enough that the sequential row scan
    is short (~128 steps) without making the cross-chunk merge dominate.
    On the CPU schedule (sequential merge over 2*lanes pieces) stay narrow."""
    cap = 8192 if _wide_schedule() else 512
    lanes = 128
    while lanes < cap and lanes * 128 < n:
        lanes *= 2
    return lanes


def _msm_device(ctx: ECCtx, P: Point, scalars: list[int]) -> Affine:
    K = jnp.asarray(ff.ints_to_array([s % ctx.r for s in scalars]))
    n = K.shape[0]
    if n >= 4096:
        lanes = default_lanes(n)
        pad = (-n) % lanes
        if pad:
            K = jnp.concatenate([K, jnp.zeros((pad, NLIMBS), U32)])
            idp = ec.identity(ctx, (pad,))
            P = tuple(jnp.concatenate([c, i]) for c, i in zip(P, idp))
        total = pippenger_jit(ctx, P, K, lanes, _wide_schedule())
    else:
        total = msm_naive_jit(ctx, P, K)
    return ec.to_affine_ints(ctx, tuple(c[None] for c in total))[0]

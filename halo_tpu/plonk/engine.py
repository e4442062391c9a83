"""Device polynomial engine: the PLONK prover's bulk math on limb arrays.

This is the TPU compute tier of the prover (SURVEY.md §7.1): NTT/iNTT,
pointwise constraint algebra, quotient division, batched evaluation, and
SRS commitments all operate on Montgomery-limb jnp arrays; the host
orchestrates rounds and runs the (tiny, sequential) Poseidon transcript.

The device prover is validated by bit-identical proof equality against the
host prover (both are deterministic in the non-hiding path).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import CurveCfg
from ..fields import two_adic_root_of_unity
from ..ops import ec, ff, msm as msm_ops, ntt
from ..ops.ff import NLIMBS, U32, FFCtx


@dataclass(frozen=True)
class Engine:
    cfg_name: str
    m: int  # scalar modulus
    # Optional jax.sharding.Mesh: when set, SRS commitments dispatch through
    # the sharded v2 MSM (parallel/msm.py) and large NTTs through the
    # 4-step all_to_all distributed NTT (parallel/ntt.py) — the mesh analog
    # of the reference prover's parallel-by-construction arkworks backends
    # (crates/group/Cargo.toml:17-24).  Proof bytes are identical either way
    # (tests/test_mesh_prover.py).
    mesh: object = None

    @property
    def ctx(self) -> FFCtx:
        return ff.ctx_for(self.m)

    def _mesh_ntt_ok(self, n: int) -> bool:
        if self.mesh is None:
            return False
        d = self.mesh.devices.size
        return n >= d * d and n % d == 0 and (n & (n - 1)) == 0

    # ---------------- conversions ---------------- #

    def to_dev(self, vals: list[int]) -> jnp.ndarray:
        """ints -> (n, 16) Montgomery limbs."""
        return ff.to_mont_jit(self.ctx, jnp.asarray(ff.ints_to_array(vals)))

    def to_dev_batch(self, cols: list[list[int]]) -> jnp.ndarray:
        """k lists of n ints -> (k, n, 16) Montgomery limbs (one transfer)."""
        flat = [v for col in cols for v in col]
        arr = ff.ints_to_array(flat).reshape(len(cols), -1, NLIMBS)
        return ff.to_mont_jit(self.ctx, jnp.asarray(arr))

    def to_ints(self, dev: jnp.ndarray) -> list[int]:
        # canonical limbs fit u16: halve the device->host transfer
        out = np.asarray(jnp.asarray(ff.from_mont_jit(self.ctx, dev), jnp.uint16))
        return ff.array_to_ints(out.reshape(-1, NLIMBS))

    # ---------------- polynomial ops ---------------- #

    # A batched NTT jit graph keeps every butterfly stage's (batch, n, 16)
    # output live in XLA's memory estimate; at (16, 2^19) that exceeds HBM
    # at COMPILE time (observed: 17.1G > 15.75G on v5e).  Past this
    # per-graph element budget, run the batch as sequential per-poly
    # dispatches of the (cached) single-poly executable instead.
    NTT_BATCH_BUDGET = 1 << 22  # elements per graph (= 256 MB of limbs)

    def _ntt_maybe_loop(self, fn, a: jnp.ndarray) -> jnp.ndarray:
        if self._mesh_ntt_ok(a.shape[-2]):
            return self._ntt_mesh(a, inverse=(fn is ntt.intt_jit))
        if a.ndim == 3 and a.shape[0] > 1 and a.shape[0] * a.shape[1] > self.NTT_BATCH_BUDGET:
            return jnp.stack([fn(self.ctx, a[i]) for i in range(a.shape[0])])
        return fn(self.ctx, a)

    def _ntt_mesh(self, a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """Distributed 4-step NTT over the mesh; result gathered back to a
        single device so downstream single-chip graphs are unaffected."""
        from ..parallel import ntt as pntt

        dev0 = list(self.mesh.devices.flat)[0]

        def one(poly):
            out = pntt.ntt_distributed(self.ctx, self.mesh, poly, inverse=inverse)
            return jax.device_put(out, dev0)

        if a.ndim == 3:
            return jnp.stack([one(a[i]) for i in range(a.shape[0])])
        return one(a)

    def intt(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self._ntt_maybe_loop(ntt.intt_jit, evals)

    def ntt(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return self._ntt_maybe_loop(ntt.ntt_jit, coeffs)

    def ntt_extended(self, coeffs: jnp.ndarray, big_n: int) -> jnp.ndarray:
        """Evaluate degree-<n coeffs over the size-big_n domain."""
        pad = big_n - coeffs.shape[-2]
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((*coeffs.shape[:-2], pad, NLIMBS), U32)], axis=-2
        )
        return self._ntt_maybe_loop(ntt.ntt_jit, padded)

    # Above this many field lanes, route muls through the v2 Pallas rows
    # kernel: the jnp mont_mul materializes (lanes, 16, 16) outer-product
    # temporaries, which at the 2^16-row prover's 8n domain is ~16 GB of
    # HLO temps (observed compile-time HBM OOM on v5e); the rows kernel
    # streams BLK-lane tiles through VMEM instead.
    MUL_ROWS_MIN = 1 << 15

    def _rows_route(self, *shapes) -> bool:
        import os

        env = os.environ.get("HALO_TPU_ENGINE_V2")
        if env is not None:
            return env == "1"
        if jax.default_backend() == "cpu":
            return False
        lanes = 1
        for d in jnp.broadcast_shapes(*shapes)[:-1]:
            lanes *= d
        return lanes >= self.MUL_ROWS_MIN

    def mul(self, a, b):
        if self._rows_route(a.shape, jnp.shape(b)):
            return _mul_rows_jit(self.m, a, jnp.asarray(b))
        return ff.mont_mul_jit(self.ctx, a, b)

    def add(self, a, b):
        return ff.add_jit(self.ctx, a, b)

    def sub(self, a, b):
        return ff.sub_jit(self.ctx, a, b)

    def scale(self, a, s: int):
        sm = self.to_dev([s % self.m])[0]
        return self.mul(a, sm)

    def rotate(self, evals: jnp.ndarray, k: int) -> jnp.ndarray:
        """shift_left by k positions (row i takes value from row i+k)."""
        return jnp.roll(evals, -k, axis=-2)

    def powers(self, x: int, n: int) -> jnp.ndarray:
        """[1, x, x^2, ...] as (n,16) Montgomery limbs (host-generated)."""
        out = [0] * n
        cur = 1
        for i in range(n):
            out[i] = cur
            cur = cur * x % self.m
        return self.to_dev(out)

    def eval_batch(self, coeffs: jnp.ndarray, x: int) -> list[int]:
        """Evaluate (k, n, 16) coefficient batch at x -> k ints."""
        n = coeffs.shape[-2]
        pw = self.powers(x, n)
        prods = self.mul(coeffs, pw)
        # per-chunk u32-exact partial sums; the (small) cross-chunk sum is
        # finished on host in exact python ints (device u64 is unavailable)
        partial = np.asarray(_chunk_sum_jit(prods), dtype=np.uint64)  # (k, g, 16)
        rinv = pow(1 << 256, -1, self.m)
        out = []
        for row in partial.reshape(-1, *partial.shape[-2:]):
            cols = row.sum(axis=0, dtype=object)
            v = sum(int(c) << (16 * i) for i, c in enumerate(cols))
            out.append(v % self.m * rinv % self.m)
        return out

    def divide_by_vanishing(self, coeffs: jnp.ndarray, n: int) -> jnp.ndarray:
        """Exact quotient by X^n - 1 for a (kn,16) coefficient array."""
        total = coeffs.shape[-2]
        k = total // n
        chunks = coeffs.reshape(*coeffs.shape[:-2], k, n, NLIMBS)
        # q[k-2] = c[k-1]; q[j] = c[j+1] + q[j+1]  (suffix sums of chunks 1..)
        out = [None] * (k - 1)
        acc = chunks[..., k - 1, :, :]
        for j in range(k - 2, -1, -1):
            out[j] = acc
            if j > 0:
                acc = ff.add_jit(self.ctx, acc, chunks[..., j, :, :])
        return jnp.concatenate(out, axis=-2)

    # ---------------- commitments ---------------- #

    def commit(self, coeffs: jnp.ndarray, d: int):
        """Commit (n,16) Montgomery coeff array against the SRS -> affine.

        On accelerators the scalars stay on device end-to-end (the v2 MSM
        consumes canonical limb rows directly); the host path pulls ints
        and goes through pcdl.commit (which picks native C++ for small n).
        """
        n = coeffs.shape[0]
        assert n <= d + 1, f"degree bound: {n} coeffs > d+1 = {d + 1}"
        if self.mesh is not None:
            return self.commit_batch(coeffs[None], d)[0]
        if jax.default_backend() != "cpu" and n >= 2048:
            from ..ops import msm2

            K = jnp.transpose(ff.from_mont_jit(self.ctx, coeffs))
            return msm2.msm2_srs_rows(_cfg_of(self.cfg_name), K, n)
        vals = self.to_ints(coeffs)
        from .. import pcdl

        return pcdl.commit(_cfg_of(self.cfg_name), vals, d)

    def commit_batch(self, coeffs: jnp.ndarray, d: int) -> list:
        """Commit a (k, n, 16) Montgomery coeff stack -> k affine points.

        On accelerators all k MSMs run as ONE batched pipeline dispatch
        (msm2_srs_rows_multi); on CPU it falls back to per-poly commit."""
        k, n = coeffs.shape[0], coeffs.shape[1]
        assert n <= d + 1, f"degree bound: {n} coeffs > d+1 = {d + 1}"
        if self.mesh is not None:
            from ..parallel import msm as pmsm

            K = jnp.transpose(ff.from_mont_jit(self.ctx, coeffs), (0, 2, 1))
            return pmsm.msm2_srs_rows_sharded(_cfg_of(self.cfg_name), self.mesh, K, n)
        if jax.default_backend() != "cpu" and n >= 2048:
            from ..ops import msm2

            K = jnp.transpose(ff.from_mont_jit(self.ctx, coeffs), (0, 2, 1))
            return msm2.msm2_srs_rows_multi(_cfg_of(self.cfg_name), K, n)
        return [self.commit(coeffs[i], d) for i in range(k)]

    # ---------------- sequential algebra ---------------- #

    def grand_product(self, ratios: jnp.ndarray) -> jnp.ndarray:
        """Permutation accumulator: z[0]=1, z[i]=z[i-1]*ratios[i] (i>=1),
        matching the reference's indexing (protocol.rs:144-155); ratios[0]
        is unused.

        On accelerators: a Hillis-Steele product scan in limb-rows layout
        over ONE cached Pallas mul kernel (log2(n) identical-shape rounds).
        jax.lax.associative_scan over the jnp mont_mul unrolls ~2 log n
        distinct-shape limb graphs -- measured 366 s of XLA compile and a
        7.3 s run at n = 2^14; this path compiles in seconds and runs in
        milliseconds."""
        n = ratios.shape[0]
        if jax.default_backend() == "cpu" or n < 1024 or n % 512:
            ctx = self.ctx

            def combine(a, b):
                return ff.mont_mul(ctx, a, b)

            prefix = jax.lax.associative_scan(combine, ratios[1:], axis=0)
            one = ff.mont_one(ctx, (1,))
            return jnp.concatenate([one, prefix], axis=0)
        return _grand_product_rows_jit(self.m, ratios)

    def batch_inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Elementwise inverse of a nonzero (n, 16) batch.

        Montgomery's trick, TPU-style: one inclusive product scan forward,
        one backward, a SINGLE field inversion (done in exact host ints on
        the 32-byte total), then inv(a_i) = prefix_excl(i) * suffix_excl(i)
        * total^-1.  Replaces the 256-round Fermat ladder, which serialized
        256 full-width muls (75% of the device prover's round 3)."""
        n = a.shape[0]
        if n < 1024 or n % 512:
            return ff.mont_inv_jit(self.ctx, a)
        # zero lanes: substitute 1 before the scan so the total product stays
        # invertible, zero the outputs after (matches the Fermat ladder's
        # inv(0) = 0 and keeps pow(t, -1, m) from raising on a degenerate
        # trace — round-3 advisor finding)
        is_zero = ff.is_zero(a)
        a_safe = jnp.where(is_zero[:, None], ff.mont_one(self.ctx, (n,)), a)
        prefix_inc, suffix_inc = _inout_scans_rows_jit(self.m, a_safe)
        total = prefix_inc[-1]
        t_int = self.to_ints(total[None])[0]
        t_inv = pow(t_int, -1, self.m)
        tinv_dev = self.to_dev([t_inv])[0]
        out = _batch_inv_combine_jit(self.m, a_safe, prefix_inc, suffix_inc, tinv_dev)
        return jnp.where(is_zero[:, None], 0, out)


from functools import partial as _partial


def _mont_ctx_for(m: int):
    from ..ops import pallas_mont as pk

    return pk.mont_ctx(m, 5)  # b unused by the mul/canon kernels


def _one_rows(m: int, width: int):
    one = ff.int_to_limbs((1 << 256) % m)
    return jnp.broadcast_to(jnp.asarray(one, U32)[:, None], (NLIMBS, width))


def _scan_mul_rows(m: int, x, reverse: bool = False):
    """Inclusive product scan along the lane axis of (16, n) rows via
    log2(n) rounds of the cached Pallas mul kernel (quasi-2p domain)."""
    from ..ops import pallas_mont as pk

    mctx = _mont_ctx_for(m)
    n = x.shape[1]
    sh = 1
    while sh < n:
        if reverse:
            shifted = jnp.concatenate([x[:, sh:], _one_rows(m, sh)], axis=1)
        else:
            shifted = jnp.concatenate([_one_rows(m, sh), x[:, :-sh]], axis=1)
        x = pk.mm_rows(mctx, x, shifted)
        sh *= 2
    return x


@_partial(jax.jit, static_argnums=0)
def _mul_rows_jit(m: int, a, b):
    """Elementwise Montgomery mul on (..., 16) col-layout arrays via the
    BLK-tiled Pallas rows kernel; bit-identical to ff.mont_mul (both return
    the canonical residue)."""
    from ..ops import pallas_mont as pk

    mctx = _mont_ctx_for(m)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    ar = jnp.transpose(jnp.broadcast_to(a, shape).reshape(-1, NLIMBS))
    br = jnp.transpose(jnp.broadcast_to(b, shape).reshape(-1, NLIMBS))
    n = ar.shape[1]
    npad = (-n) % pk.BLK
    if npad:
        z = jnp.zeros((NLIMBS, npad), U32)
        ar = jnp.concatenate([ar, z], axis=1)
        br = jnp.concatenate([br, z], axis=1)
    out = pk.canon_rows(mctx, pk.mm_rows(mctx, ar, br))
    return jnp.transpose(out[:, :n]).reshape(shape)


@_partial(jax.jit, static_argnums=0)
def _grand_product_rows_jit(m: int, ratios):
    from ..ops import pallas_mont as pk

    mctx = _mont_ctx_for(m)
    x = jnp.transpose(ratios)  # (16, n)
    x = jnp.concatenate([_one_rows(m, 1), x[:, 1:]], axis=1)  # drop ratios[0]
    z = _scan_mul_rows(m, x)
    return jnp.transpose(pk.canon_rows(mctx, z))


@_partial(jax.jit, static_argnums=0)
def _inout_scans_rows_jit(m: int, a):
    from ..ops import pallas_mont as pk

    mctx = _mont_ctx_for(m)
    x = jnp.transpose(a)
    fwd = _scan_mul_rows(m, x)
    bwd = _scan_mul_rows(m, x, reverse=True)
    return jnp.transpose(pk.canon_rows(mctx, fwd)), jnp.transpose(pk.canon_rows(mctx, bwd))


@_partial(jax.jit, static_argnums=0)
def _batch_inv_combine_jit(m: int, a, prefix_inc, suffix_inc, tinv):
    from ..ops import pallas_mont as pk

    mctx = _mont_ctx_for(m)
    ctx = ff.ctx_for(m)
    one = ff.mont_one(ctx, (1,))
    pre_excl = jnp.concatenate([one, prefix_inc[:-1]], axis=0)
    suf_excl = jnp.concatenate([suffix_inc[1:], one], axis=0)
    out = pk.mm_rows(mctx, jnp.transpose(pre_excl), jnp.transpose(suf_excl))
    out = pk.mm_rows(mctx, out, jnp.broadcast_to(
        jnp.transpose(tinv[None]), out.shape))
    return jnp.transpose(pk.canon_rows(mctx, out))


@jax.jit
def _chunk_sum_jit(prods: jnp.ndarray) -> jnp.ndarray:
    """Per-chunk limb-column sums of (..., n, 16): returns (..., groups, 16)
    u32 partials, exact since each chunk has <= 2^12 values < 2^16."""
    n = prods.shape[-2]
    chunk = 1 << 12
    pad = (-n) % chunk
    if pad:
        prods = jnp.concatenate(
            [prods, jnp.zeros((*prods.shape[:-2], pad, NLIMBS), prods.dtype)], axis=-2
        )
    grouped = prods.reshape(*prods.shape[:-2], -1, chunk, NLIMBS)
    return jnp.sum(grouped, axis=-2)  # (..., groups, 16) u32 exact


@lru_cache(maxsize=4)
def _cfg_of(name: str) -> CurveCfg:
    from ..curves import PALLAS, VESTA

    return PALLAS if name == "pallas" else VESTA


def engine_for(cfg: CurveCfg, mesh=None) -> Engine:
    return Engine(cfg_name=cfg.name, m=cfg.r, mesh=mesh)

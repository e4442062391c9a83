"""Host-tier polynomial/evaluation utilities over the Pasta scalar fields.

Mirrors the reference's ark-poly usage and its Evals wrapper semantics
(crates/group/src/poly.rs), including the quirks that affect bytes
(SURVEY.md §7.4 item 5):

  * Evals.from_vec_and_domain rotates the vector RIGHT by one, so row i of a
    trace lives at domain element w^(i+1) (poly.rs:21-31)
  * extend() re-applies the rotation on the resized raw vector (poly.rs:84-88)
  * divide_by_vanishing is exact division by X^n - 1

Polynomials are little-endian int coefficient lists.  The device tier
mirrors these ops on Montgomery limb arrays (halo_tpu/plonk/engine.py).
"""

from __future__ import annotations

from functools import lru_cache

from .fields import two_adic_root_of_unity


@lru_cache(maxsize=128)
def _roots(m: int, log_n: int, inverse: bool) -> tuple:
    n = 1 << log_n
    w = two_adic_root_of_unity(m, log_n)
    if inverse:
        w = pow(w, -1, m)
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * w % m
    return tuple(out)


def domain_element(m: int, n: int, i: int) -> int:
    return _roots(m, n.bit_length() - 1, False)[i % n]


from .config import get_config

# above this size, route host NTT calls through the device tier
NTT_DEVICE_MIN = get_config().ntt_device_min


def ntt_host(m: int, vec: list[int], inverse: bool = False) -> list[int]:
    """In-order radix-2 NTT: out[i] = p(w^i); matches ark-poly's fft."""
    n = len(vec)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n >= NTT_DEVICE_MIN:
        return _ntt_device(m, vec, inverse)
    from . import native

    if native.available() and n >= 8:
        return native.ntt(m, vec, two_adic_root_of_unity(m, log_n), inverse)
    a = list(vec)
    # bit reversal
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    roots = _roots(m, log_n, inverse)
    length = 2
    while length <= n:
        step = n // length
        half = length // 2
        for start in range(0, n, length):
            idx = 0
            for k in range(start, start + half):
                tw = roots[idx]
                u = a[k]
                v = a[k + half] * tw % m
                a[k] = (u + v) % m
                a[k + half] = (u - v) % m
                idx += step
        length *= 2
    if inverse:
        n_inv = pow(n, -1, m)
        a = [x * n_inv % m for x in a]
    return a


def _ntt_device(m: int, vec: list[int], inverse: bool) -> list[int]:
    import jax.numpy as jnp
    import numpy as np

    from .ops import ff, ntt

    ctx = ff.ctx_for(m)
    a = ff.to_mont_jit(ctx, jnp.asarray(ff.ints_to_array(vec)))
    out = ntt.intt_jit(ctx, a) if inverse else ntt.ntt_jit(ctx, a)
    return ff.array_to_ints(np.asarray(ff.from_mont_jit(ctx, out)))


# per-graph element budget for a batched NTT (see Engine.NTT_BATCH_BUDGET:
# every butterfly stage's (k, n, 16) output is live in XLA's HBM estimate)
_NTT_BATCH_BUDGET = 1 << 22


def ntt_host_batch(m: int, vecs: list[list[int]], inverse: bool = False,
                   want_dev: bool = False, want_host: bool = True):
    """Batched ntt_host over k same-length vectors.

    Above the device threshold the whole group runs as ONE (k, n, 16)
    device dispatch with a single host<->device transfer each way — the
    per-poly transfer latency dominated the arithmetizer at 2^16 rows
    (profiled ~0.55 s/poly warm, of which <0.15 s was the transform).

    want_dev=True additionally returns the device-resident Montgomery
    arrays — (outs, dev_out, dev_in), each dev (k, n, 16) or None — so
    downstream device consumers (the device prover) can skip re-uploading
    the same polynomials (dev_out: transform output; dev_in: the input,
    i.e. the eval-domain vectors when inverse=True)."""
    if not vecs:
        return ([], None, None) if want_dev else []
    n = len(vecs[0])
    if n < NTT_DEVICE_MIN or any(len(v) != n for v in vecs):
        res = [ntt_host(m, v, inverse) for v in vecs]
        return (res, None, None) if want_dev else res

    import jax.numpy as jnp
    import numpy as np

    from .ops import ff, ntt as ntt_ops

    ctx = ff.ctx_for(m)
    outs: list[list[int]] = []
    devs_out = []
    devs_in = []
    k_max = max(1, _NTT_BATCH_BUDGET // n)
    for i in range(0, len(vecs), k_max):
        chunk = vecs[i : i + k_max]
        flat = [v for col in chunk for v in col]
        arr = ff.ints_to_array(flat).reshape(len(chunk), n, -1)
        a = ff.to_mont_jit(ctx, jnp.asarray(arr))
        out = ntt_ops.intt_jit(ctx, a) if inverse else ntt_ops.ntt_jit(ctx, a)
        if want_dev:
            devs_in.append(a)
            devs_out.append(out)
        if want_host:
            # canonical limbs are < 2^16: pull as u16 (halves the transfer,
            # which dominates the warm cost through the device tunnel)
            host = np.asarray(jnp.asarray(ff.from_mont_jit(ctx, out), jnp.uint16))
            outs.extend(ff.array_to_ints(host[j]) for j in range(len(chunk)))
    if not want_dev:
        return outs

    def _cat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    return outs, _cat(devs_out), _cat(devs_in)


def interpolate_evals_batch(evals: list["HostEvals"], want_dev: bool = False,
                            want_host: bool = True):
    """Batched HostEvals.interpolate over a same-domain group."""
    if not evals:
        return ([], None, None) if want_dev else []
    m = evals[0].m
    return ntt_host_batch(m, [e.vec for e in evals], inverse=True,
                          want_dev=want_dev, want_host=want_host)


def poly_eval(m: int, coeffs: list[int], z: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % m
    return acc


def poly_add(m: int, a: list[int], b: list[int]) -> list[int]:
    n = max(len(a), len(b))
    out = [0] * n
    for i, c in enumerate(a):
        out[i] = c
    for i, c in enumerate(b):
        out[i] = (out[i] + c) % m
    return out


def poly_sub(m: int, a: list[int], b: list[int]) -> list[int]:
    return poly_add(m, a, [(-c) % m for c in b])


def poly_scale(m: int, a: list[int], s: int) -> list[int]:
    return [c * s % m for c in a]


def poly_mul(m: int, a: list[int], b: list[int]) -> list[int]:
    if not a or not b:
        return []
    deg = len(a) + len(b) - 1
    n = 1 << (deg - 1).bit_length() if deg > 1 else 1
    if n < deg:
        n <<= 1
    fa = ntt_host(m, a + [0] * (n - len(a)))
    fb = ntt_host(m, b + [0] * (n - len(b)))
    fc = [x * y % m for x, y in zip(fa, fb)]
    return ntt_host(m, fc, inverse=True)[:deg]


def divide_by_vanishing(m: int, coeffs: list[int], n: int) -> list[int]:
    """Exact quotient of p(X) by X^n - 1: q[k] = sum_{j>=1} p[k + j*n]."""
    out_len = max(len(coeffs) - n, 0)
    q = [0] * out_len
    for k in range(out_len - 1, -1, -1):
        above = coeffs[k + n] if k + n < len(coeffs) else 0
        q[k] = (above + (q[k + n] if k + n < out_len else 0)) % m
    return q


class HostEvals:
    """Reference-faithful Evals wrapper: stores the raw (already rotated)
    evaluation vector over a size-n domain."""

    __slots__ = ("m", "vec")

    def __init__(self, m: int, raw_vec: list[int]):
        self.m = m
        self.vec = raw_vec

    @classmethod
    def from_vec_and_domain(cls, m: int, vec: list[int]) -> "HostEvals":
        # rotate right by one (reference poly.rs:21-31)
        return cls(m, [vec[-1]] + vec[:-1])

    @classmethod
    def from_poly(cls, m: int, coeffs: list[int], n: int) -> "HostEvals":
        padded = list(coeffs[:n]) + [0] * max(0, n - len(coeffs))
        if len(coeffs) > n:
            # evaluate_over_domain for deg >= n folds coefficients mod X^n-1
            padded = list(coeffs) + [0] * ((-len(coeffs)) % n)
            folded = [0] * n
            for i, c in enumerate(padded):
                folded[i % n] = (folded[i % n] + c) % m
            padded = folded
        return cls(m, ntt_host(m, padded))

    def __len__(self) -> int:
        return len(self.vec)

    def __getitem__(self, i: int) -> int:
        return self.vec[i]

    def shift_left(self) -> "HostEvals":
        return HostEvals(self.m, self.vec[1:] + self.vec[:1])

    def shift_right(self) -> "HostEvals":
        return HostEvals(self.m, self.vec[-1:] + self.vec[:-1])

    def shift_left_small_domain(self, small_n: int) -> "HostEvals":
        offset = len(self.vec) // small_n
        v = self.vec
        return HostEvals(self.m, v[offset:] + v[:offset])

    def extend(self, new_n: int) -> "HostEvals":
        vec = list(self.vec) + [0] * (new_n - len(self.vec))
        return HostEvals.from_vec_and_domain(self.m, vec)

    def interpolate(self) -> list[int]:
        return ntt_host(self.m, self.vec, inverse=True)

    def omega(self) -> int:
        return domain_element(self.m, len(self.vec), 1)

    # pointwise ops
    def _zip(self, other, fn) -> "HostEvals":
        assert len(self.vec) == len(other.vec)
        m = self.m
        return HostEvals(m, [fn(a, b) % m for a, b in zip(self.vec, other.vec)])

    def __add__(self, other):
        return self._zip(other, lambda a, b: a + b)

    def __sub__(self, other):
        return self._zip(other, lambda a, b: a - b)

    def __mul__(self, other):
        return self._zip(other, lambda a, b: a * b)

    def scale(self, s: int) -> "HostEvals":
        m = self.m
        return HostEvals(m, [a * s % m for a in self.vec])

    def add_scalar(self, s: int) -> "HostEvals":
        m = self.m
        return HostEvals(m, [(a + s) % m for a in self.vec])

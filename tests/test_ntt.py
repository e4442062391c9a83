"""NTT vs host Horner evaluation ground truth."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo_tpu.fields import FP_MOD, FQ_MOD, two_adic_root_of_unity
from halo_tpu.ops import ff, ntt

rng = random.Random(23)


def host_eval(coeffs, x, m):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % m
    return acc


@pytest.mark.parametrize("m", [FP_MOD, FQ_MOD], ids=["fp", "fq"])
def test_ntt_matches_horner(m):
    ctx = ff.ctx_for(m)
    log_n = 4
    n = 1 << log_n
    coeffs = [rng.randrange(m) for _ in range(n)]
    a = ff.to_mont_jit(ctx, ff.ints_to_array(coeffs))
    evals = ff.array_to_ints(np.asarray(ff.from_mont_jit(ctx, ntt.ntt_jit(ctx, a))))
    w = two_adic_root_of_unity(m, log_n)
    assert pow(w, n, m) == 1 and pow(w, n // 2, m) != 1
    expected = [host_eval(coeffs, pow(w, i, m), m) for i in range(n)]
    assert evals == expected


def test_intt_roundtrip():
    ctx = ff.FP_CTX
    n = 32
    coeffs = [rng.randrange(FP_MOD) for _ in range(n)]
    a = ff.to_mont_jit(ctx, ff.ints_to_array(coeffs))
    back = ntt.intt_jit(ctx, ntt.ntt_jit(ctx, a))
    got = ff.array_to_ints(np.asarray(ff.from_mont_jit(ctx, back)))
    assert got == coeffs


def test_batched_ntt():
    ctx = ff.FQ_CTX
    n = 8
    polys = [[rng.randrange(FQ_MOD) for _ in range(n)] for _ in range(3)]
    a = jnp.stack([ff.to_mont_jit(ctx, ff.ints_to_array(p)) for p in polys])
    out = ntt.ntt_jit(ctx, a)
    assert out.shape == (3, n, 16)
    w = two_adic_root_of_unity(FQ_MOD, 3)
    for k, p in enumerate(polys):
        evals = ff.array_to_ints(np.asarray(ff.from_mont_jit(ctx, out[k])))
        assert evals == [host_eval(p, pow(w, i, FQ_MOD), FQ_MOD) for i in range(n)]

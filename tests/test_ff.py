"""Device-tier field arithmetic vs host python-int ground truth."""

import random

import numpy as np
import pytest

from halo_tpu.fields import FP_MOD, FQ_MOD
from halo_tpu.ops import ff

rng = random.Random(5)


def rand_vals(m, n):
    vals = [rng.randrange(m) for _ in range(n - 3)] + [0, 1, m - 1]
    return vals


@pytest.mark.parametrize("m", [FP_MOD, FQ_MOD], ids=["fp", "fq"])
def test_limb_conversions(m):
    vals = rand_vals(m, 8)
    arr = ff.ints_to_array(vals)
    assert ff.array_to_ints(arr) == vals
    assert ff.limbs_to_int(ff.int_to_limbs(vals[0])) == vals[0]


@pytest.mark.parametrize("m", [FP_MOD, FQ_MOD], ids=["fp", "fq"])
def test_add_sub(m):
    ctx = ff.ctx_for(m)
    n = 64
    a = rand_vals(m, n)
    b = list(reversed(rand_vals(m, n)))
    aa, bb = ff.ints_to_array(a), ff.ints_to_array(b)
    got_add = ff.array_to_ints(np.asarray(ff.add_jit(ctx, aa, bb)))
    got_sub = ff.array_to_ints(np.asarray(ff.sub_jit(ctx, aa, bb)))
    assert got_add == [(x + y) % m for x, y in zip(a, b)]
    assert got_sub == [(x - y) % m for x, y in zip(a, b)]


@pytest.mark.parametrize("m", [FP_MOD, FQ_MOD], ids=["fp", "fq"])
def test_mont_mul(m):
    ctx = ff.ctx_for(m)
    n = 64
    a = rand_vals(m, n)
    b = list(reversed(rand_vals(m, n)))
    am = ff.to_mont_jit(ctx, ff.ints_to_array(a))
    bm = ff.to_mont_jit(ctx, ff.ints_to_array(b))
    prod_m = ff.mont_mul_jit(ctx, am, bm)
    got = ff.array_to_ints(np.asarray(ff.from_mont_jit(ctx, prod_m)))
    assert got == [x * y % m for x, y in zip(a, b)]


@pytest.mark.parametrize("m", [FP_MOD, FQ_MOD], ids=["fp", "fq"])
def test_mont_roundtrip(m):
    ctx = ff.ctx_for(m)
    vals = rand_vals(m, 16)
    arr = ff.ints_to_array(vals)
    back = ff.from_mont_jit(ctx, ff.to_mont_jit(ctx, arr))
    assert ff.array_to_ints(np.asarray(back)) == vals


@pytest.mark.parametrize("m", [FP_MOD, FQ_MOD], ids=["fp", "fq"])
def test_inverse(m):
    ctx = ff.ctx_for(m)
    vals = [rng.randrange(1, m) for _ in range(8)] + [1, m - 1]
    am = ff.to_mont_jit(ctx, ff.ints_to_array(vals))
    inv_m = ff.mont_inv_jit(ctx, am)
    got = ff.array_to_ints(np.asarray(ff.from_mont_jit(ctx, inv_m)))
    assert got == [pow(v, -1, m) for v in vals]


def test_batched_shapes():
    ctx = ff.FP_CTX
    a = ff.ints_to_array([rng.randrange(FP_MOD) for _ in range(12)]).reshape(3, 4, 16)
    b = ff.ints_to_array([rng.randrange(FP_MOD) for _ in range(12)]).reshape(3, 4, 16)
    out = ff.mont_mul_jit(ctx, a, b)
    assert out.shape == (3, 4, 16)
    # broadcast: (1,16) against (3,4,16)
    c = ff.ints_to_array([7])
    out2 = ff.mont_mul(ctx, a, c.reshape(16))
    assert out2.shape == (3, 4, 16)

"""Differential tests: Pallas mont_mul kernel vs the jnp path vs host ints.

On the CPU CI backend the kernel runs in Pallas interpreter mode; on TPU it
compiles to a real Mosaic kernel.  Both must agree bit-for-bit with the jnp
mont_mul and with exact Python-int Montgomery arithmetic.
"""

import random

import numpy as np
import pytest

from halo_tpu.fields import FP_MOD, FQ_MOD
from halo_tpu.ops import ff
from halo_tpu.ops.pallas_ff import mont_mul_pallas

rng = random.Random(42)


@pytest.mark.parametrize("mod", [FP_MOD, FQ_MOD])
def test_mont_mul_pallas_matches_host(mod):
    ctx = ff.ctx_for(mod)
    n = 64
    xs = [rng.randrange(mod) for _ in range(n)]
    ys = [rng.randrange(mod) for _ in range(n)]
    # include edge values
    xs[:4] = [0, 1, mod - 1, (1 << 256) % mod]
    ys[:4] = [mod - 1, mod - 1, mod - 1, 1]
    a = ff.ints_to_array(xs)
    b = ff.ints_to_array(ys)

    got = np.asarray(mont_mul_pallas(ctx, a, b))
    rinv = pow(1 << 256, -1, mod)
    want = ff.ints_to_array([x * y * rinv % mod for x, y in zip(xs, ys)])
    assert np.array_equal(got, want)


def test_mont_mul_pallas_matches_jnp():
    ctx = ff.FP_CTX
    n = 100  # non-multiple of BLK exercises padding
    a = ff.ints_to_array([rng.randrange(FP_MOD) for _ in range(n)])
    b = ff.ints_to_array([rng.randrange(FP_MOD) for _ in range(n)])
    got = np.asarray(mont_mul_pallas(ctx, a, b))
    want = np.asarray(ff.mont_mul_jit(ctx, a, b))
    assert np.array_equal(got, want)

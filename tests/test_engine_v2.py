"""Force the engine's accelerator-only v2 routes on the CPU backend
(interpret-mode Pallas) and pin them against the jnp reference tier —
round-3 advisor finding: these production paths were otherwise unreachable
in CI."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo_tpu.curves import PALLAS
from halo_tpu.ops import ff
from halo_tpu.plonk.engine import engine_for

rng = random.Random(71)


def test_mul_rows_matches_jnp(monkeypatch):
    monkeypatch.setenv("HALO_TPU_ENGINE_V2", "1")
    eng = engine_for(PALLAS)
    m = PALLAS.r
    n = 512
    a = [rng.randrange(m) for _ in range(n)]
    b = [rng.randrange(m) for _ in range(n)]
    a_dev, b_dev = eng.to_dev(a), eng.to_dev(b)
    got = eng.mul(a_dev, b_dev)
    want = ff.mont_mul_jit(eng.ctx, a_dev, b_dev)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    # leading batch axes + broadcast scalar (the scale path)
    a3 = a_dev.reshape(2, 256, 16)
    got3 = eng.mul(a3, b_dev[0])
    want3 = ff.mont_mul_jit(eng.ctx, a3, b_dev[0])
    assert np.array_equal(np.asarray(got3), np.asarray(want3))


def test_mul_rows_zero_and_pad_lanes(monkeypatch):
    monkeypatch.setenv("HALO_TPU_ENGINE_V2", "1")
    eng = engine_for(PALLAS)
    m = PALLAS.r
    n = 300  # not a BLK multiple: exercises the pad/truncate path
    a = [0, 1, m - 1] + [rng.randrange(m) for _ in range(n - 3)]
    b = [rng.randrange(m) for _ in range(n)]
    got = eng.mul(eng.to_dev(a), eng.to_dev(b))
    assert eng.to_ints(got) == [x * y % m for x, y in zip(a, b)]


def test_commit_asserts_degree_bound():
    eng = engine_for(PALLAS)
    coeffs = eng.to_dev([1, 2, 3, 4])
    with pytest.raises(AssertionError):
        eng.commit(coeffs, 2)

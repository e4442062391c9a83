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


def test_loop_ntt_matches_unrolled(monkeypatch):
    """The uniform-shape fori_loop NTT (CPU path for big n; added after the
    round-4 XLA:CPU giant-executable segfaults) is bit-identical to the
    unrolled stage graph, both directions, batched and unbatched."""
    import random

    import numpy as np

    from halo_tpu.fields import FP_MOD
    from halo_tpu.ops import ff as ffm
    from halo_tpu.ops import ntt as nttm

    ctx = ffm.ctx_for(FP_MOD)
    rng = random.Random(123)
    n = 1 << 10
    vals = [rng.randrange(FP_MOD) for _ in range(3 * n)]
    a = ffm.to_mont_jit(ctx, ffm.ints_to_array(vals).reshape(3, n, 16))
    for inverse in (False, True):
        fn = nttm.intt if inverse else nttm.ntt
        monkeypatch.setenv("HALO_TPU_NTT_LOOP", "0")
        want = np.asarray(fn(ctx, a))
        want1 = np.asarray(fn(ctx, a[0]))
        monkeypatch.setenv("HALO_TPU_NTT_LOOP", "1")
        got = np.asarray(fn(ctx, a))
        got1 = np.asarray(fn(ctx, a[0]))
        assert np.array_equal(got, want)
        assert np.array_equal(got1, want1)

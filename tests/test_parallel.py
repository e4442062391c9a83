"""Multi-chip paths on the virtual 8-device CPU mesh (SURVEY.md §4 item 7)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo_tpu import curves as hc
from halo_tpu.fields import FP_MOD
from halo_tpu.ops import ec, ff, ntt
from halo_tpu.parallel import mesh as pmesh
from halo_tpu.parallel import msm as pmsm
from halo_tpu.parallel import ntt as pntt

rng = random.Random(77)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force an 8-device CPU mesh"
    return pmesh.data_mesh(8)


def test_sharded_msm_matches_host(mesh8):
    cfg = hc.PALLAS
    n = 64
    pts = [hc.ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r)) for _ in range(n)]
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    got = pmsm.msm_sharded(cfg, mesh8, ks, pts)
    assert got == hc.msm_host(cfg, ks, pts)


def test_distributed_ntt_matches_single(mesh8):
    ctx = ff.FP_CTX
    log_n = 7
    n = 1 << log_n
    coeffs = [rng.randrange(FP_MOD) for _ in range(n)]
    a = ff.to_mont_jit(ctx, ff.ints_to_array(coeffs))
    single = np.asarray(ntt.ntt_jit(ctx, a))
    dist = np.asarray(pntt.ntt_distributed(ctx, mesh8, a))
    assert ff.array_to_ints(dist) == ff.array_to_ints(single)


def test_distributed_intt_roundtrip(mesh8):
    ctx = ff.FP_CTX
    n = 128
    coeffs = [rng.randrange(FP_MOD) for _ in range(n)]
    a = ff.to_mont_jit(ctx, ff.ints_to_array(coeffs))
    evals = pntt.ntt_distributed(ctx, mesh8, a)
    back = pntt.ntt_distributed(ctx, mesh8, evals, inverse=True)
    got = ff.array_to_ints(np.asarray(ff.from_mont_jit(ctx, back)))
    assert got == coeffs

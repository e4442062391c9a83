"""Accumulation scheme round-trips (mirrors reference acc.rs test strategy)."""

import random

import pytest

from halo_tpu import acc as acc_mod
from halo_tpu import pcdl
from halo_tpu.curves import PALLAS, VESTA

rng = random.Random(17)


def _rand_instance(cfg, n, hiding=True):
    p = [rng.randrange(cfg.r) for _ in range(n)]
    z = rng.randrange(cfg.r)
    w = rng.randrange(cfg.r) if hiding else None
    return pcdl.Instance.open(cfg, p, n - 1, z, w=w, rng=rng)


def test_acc_scheme_chain():
    # chain of accumulations ending in a decider (reference test_acc_scheme)
    cfg = PALLAS
    n = 8
    acc = None
    for _ in range(3):
        q = _rand_instance(cfg, n)
        qs = [acc.q, q] if acc is not None else [q]
        acc = acc_mod.prover(cfg, qs, rng=rng)
        acc_mod.verifier(cfg, qs, acc)
    acc_mod.decider(cfg, acc)


def test_acc_scheme_vesta():
    cfg = VESTA
    n = 4
    q = _rand_instance(cfg, n, hiding=False)
    acc = acc_mod.prover(cfg, [q], rng=rng)
    acc_mod.verifier(cfg, [q], acc)
    acc_mod.decider(cfg, acc)


def test_acc_wrong_instance_rejected():
    cfg = PALLAS
    n = 8
    q1 = _rand_instance(cfg, n)
    q2 = _rand_instance(cfg, n)
    acc = acc_mod.prover(cfg, [q1], rng=rng)
    with pytest.raises(ValueError):
        acc_mod.verifier(cfg, [q2], acc)


def test_acc_zero():
    # zero instances accumulate and pass the decider (reference test_acc_zero)
    cfg = PALLAS
    n = 8
    zero_pi = pcdl.open_without_eval(cfg, [0], None, n - 1, 0, 0, None)
    q = pcdl.Instance(C=None, d=n - 1, z=0, v=0, pi=zero_pi)
    qs = [q, q]
    acc = acc_mod.prover(cfg, qs, rng=rng)
    acc_mod.verifier(cfg, qs, acc)
    acc_mod.decider(cfg, acc)

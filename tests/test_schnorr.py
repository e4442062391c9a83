"""Schnorr sign/verify round-trips + negative tests (reference: crates/schnorr)."""

import random

from halo_tpu.curves import PALLAS, VESTA, ec_mul
from halo_tpu.schnorr import SchnorrSignature, generate_keypair, sign, verify

rng = random.Random(99)


def _keypair(cfg):
    sk = rng.randrange(1, cfg.r)
    return sk, ec_mul(cfg, cfg.generator, sk)


def test_sign_verify_roundtrip():
    for cfg in (PALLAS, VESTA):
        sk, pk = _keypair(cfg)
        msg = [rng.randrange(cfg.p) for _ in range(rng.randrange(3, 15))]
        sig = sign(cfg, sk, msg, k=rng.randrange(1, cfg.r))
        assert verify(cfg, pk, msg, sig)


def test_empty_message():
    cfg = PALLAS
    sk, pk = _keypair(cfg)
    sig = sign(cfg, sk, [], k=rng.randrange(1, cfg.r))
    assert verify(cfg, pk, [], sig)


def test_wrong_message_fails():
    cfg = PALLAS
    sk, pk = _keypair(cfg)
    sig = sign(cfg, sk, [1], k=rng.randrange(1, cfg.r))
    assert not verify(cfg, pk, [2], sig)


def test_invalid_signature_fails():
    cfg = PALLAS
    sk, pk = _keypair(cfg)
    sig = sign(cfg, sk, [1], k=rng.randrange(1, cfg.r))
    bad = SchnorrSignature(r=sig.r, s=(sig.s + 1) % cfg.r)
    assert not verify(cfg, pk, [1], bad)


def test_different_keypair_fails():
    cfg = PALLAS
    sk, _ = _keypair(cfg)
    _, other_pk = _keypair(cfg)
    sig = sign(cfg, sk, [1], k=rng.randrange(1, cfg.r))
    assert not verify(cfg, other_pk, [1], sig)


def test_generate_keypair():
    sk, pk = generate_keypair(PALLAS)
    assert PALLAS.is_on_curve(pk)
    assert ec_mul(PALLAS, PALLAS.generator, sk) == pk

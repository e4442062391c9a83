"""Batched Schnorr verification (ops/schnorr_batch.py) vs the scalar path.

Reference semantics: crates/schnorr/src/lib.rs verify; the batch path must
match per-signature verify() bit-for-bit, including rejections.
"""

import random

import pytest

from halo_tpu import schnorr
from halo_tpu.curves import PALLAS
from halo_tpu.ops.schnorr_batch import hash_message_batch
from halo_tpu.poseidon.sponge import hash_message


@pytest.fixture(scope="module")
def keypair():
    rng = random.Random(1001)
    return schnorr.generate_keypair(PALLAS, rng)


def test_hash_message_batch_matches_host(keypair):
    rng = random.Random(7)
    sk, pk = keypair
    msgs = [[rng.randrange(PALLAS.p) for _ in range(10)] for _ in range(4)]
    sigs = schnorr.sign_batch(PALLAS, sk, msgs, rng)
    want = [hash_message(PALLAS, pk, s.r, m) for s, m in zip(sigs, msgs)]
    got = hash_message_batch(PALLAS, pk, [s.r for s in sigs], msgs)
    assert got == want


def test_sign_batch_verifies_scalar(keypair):
    rng = random.Random(8)
    sk, pk = keypair
    msgs = [[rng.randrange(PALLAS.p) for _ in range(3)] for _ in range(3)]
    sigs = schnorr.sign_batch(PALLAS, sk, msgs, rng)
    for m, s in zip(msgs, sigs):
        assert schnorr.verify(PALLAS, pk, m, s)


@pytest.mark.slow
def test_verify_batch_matches_scalar(keypair):
    rng = random.Random(9)
    sk, pk = keypair
    msgs = [[rng.randrange(PALLAS.p) for _ in range(10)] for _ in range(6)]
    sigs = schnorr.sign_batch(PALLAS, sk, msgs, rng)
    # tamper: bad s, bad message, bad R
    sigs[1] = schnorr.SchnorrSignature(r=sigs[1].r, s=(sigs[1].s + 1) % PALLAS.r)
    msgs[3] = list(msgs[3])
    msgs[3][0] = (msgs[3][0] + 1) % PALLAS.p
    sigs[4] = schnorr.SchnorrSignature(r=sigs[0].r, s=sigs[4].s)
    want = [schnorr.verify(PALLAS, pk, m, s) for m, s in zip(msgs, sigs)]
    assert want == [True, False, True, False, False, True]
    got = schnorr.verify_batch(PALLAS, pk, msgs, sigs)
    assert got == want

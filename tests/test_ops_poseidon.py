"""Batched device Poseidon permutation vs the host/kimchi-pinned tier."""

import random

from halo_tpu.fields import FP_MOD, FQ_MOD
from halo_tpu.ops.poseidon import permute_ints
from halo_tpu.poseidon.sponge import permute

rng = random.Random(5)


def test_permute_batch_matches_host():
    for m in (FP_MOD, FQ_MOD):
        states = [[rng.randrange(m) for _ in range(3)] for _ in range(9)]
        states[0] = [0, 0, 0]
        got = permute_ints(m, states)
        want = [permute(list(st), m) for st in states]
        assert got == want

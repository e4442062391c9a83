"""Host-tier Poseidon permutation, sponge, and Fiat-Shamir transcript.

Bit-exact re-implementation of the reference semantics
(crates/poseidon/src/inner_sponge.rs, outer_sponge.rs):

  * state size 3 (rate 2, capacity 1); 55 full rounds
  * full round: sbox x^7 on all 3 words -> 3x3 MDS -> add round constants
  * absorb adds into state[0..rate] lazily (permute only when rate exhausted)
  * squeeze returns state words, permuting when entering squeeze mode
  * transcript: domain-label absorbed first; points absorbed as affine (x,y)
    with infinity as (0,0); scalars absorbed with the modulus-comparison
    bit-split rule; challenges squeeze a base-field element and drop the low
    bit when converting down to a smaller scalar field

Only a handful of sponge evaluations happen per protocol round, so this host
tier is not performance-critical; bulk permutation work (batched witness
generation, many-leaf hashing) uses the device tier in halo_tpu/ops/
poseidon.py (permute_batch) or the C++ batch path (native.poseidon_permute).
"""

from __future__ import annotations

from enum import IntEnum

from ..curves import PALLAS, Affine, CurveCfg
from ..fields import FP_MOD, FQ_MOD
from .constants import FP_MDS, FP_ROUND_CONSTANTS, FQ_MDS, FQ_ROUND_CONSTANTS

SPONGE_RATE = 2
PERM_ROUNDS_FULL = 55
STATE_SIZE = 3


def _params_for_modulus(m: int):
    if m == FQ_MOD:
        return FQ_MDS, FQ_ROUND_CONSTANTS
    assert m == FP_MOD
    return FP_MDS, FP_ROUND_CONSTANTS


def _sbox(x: int, m: int) -> int:
    x2 = x * x % m
    x3 = x2 * x % m
    x4 = x2 * x2 % m
    return x4 * x3 % m


def permute(state: list[int], m: int) -> list[int]:
    """55 full rounds of the kimchi Poseidon permutation over F_m."""
    from .. import native

    if native.available():
        return native.poseidon_permute(m, state)
    mds, rcs = _params_for_modulus(m)
    s0, s1, s2 = state
    for r in range(PERM_ROUNDS_FULL):
        s0 = _sbox(s0, m)
        s1 = _sbox(s1, m)
        s2 = _sbox(s2, m)
        rc = rcs[r]
        n0 = (mds[0][0] * s0 + mds[0][1] * s1 + mds[0][2] * s2 + rc[0]) % m
        n1 = (mds[1][0] * s0 + mds[1][1] * s1 + mds[1][2] * s2 + rc[1]) % m
        n2 = (mds[2][0] * s0 + mds[2][1] * s1 + mds[2][2] * s2 + rc[2]) % m
        s0, s1, s2 = n0, n1, n2
    return [s0, s1, s2]


class PoseidonSponge:
    """Sponge over F_m with the reference's lazy absorb/squeeze schedule."""

    def __init__(self, m: int):
        self.m = m
        self.state = [0, 0, 0]
        self.absorbed = 0  # position when absorbing
        self.squeezed = -1  # -1 => absorbing mode; else squeeze position

    def absorb(self, xs) -> None:
        m = self.m
        for x in xs:
            if self.squeezed >= 0:  # was squeezing -> restart absorb at 0
                self.squeezed = -1
                self.absorbed = 1
                self.state[0] = (self.state[0] + x) % m
            elif self.absorbed < SPONGE_RATE:
                self.state[self.absorbed] = (self.state[self.absorbed] + x) % m
                self.absorbed += 1
            else:
                self.state = permute(self.state, m)
                self.absorbed = 1
                self.state[0] = (self.state[0] + x) % m

    def squeeze(self) -> int:
        if 0 <= self.squeezed < SPONGE_RATE:
            out = self.state[self.squeezed]
            self.squeezed += 1
            return out
        self.state = permute(self.state, self.m)
        self.squeezed = 1
        self.absorbed = 0
        return self.state[0]

    def reset(self) -> None:
        self.state = [0, 0, 0]
        self.absorbed = 0
        self.squeezed = -1


class Protocols(IntEnum):
    PCDL = 0
    ASDL = 1
    PLONK = 2
    SIGNATURE = 3


class Sponge:
    """Fiat-Shamir transcript over a curve's base field.

    Mirrors reference crates/poseidon/src/outer_sponge.rs:12-100.
    """

    def __init__(self, label: Protocols, cfg: CurveCfg):
        self.cfg = cfg
        self.sponge = PoseidonSponge(cfg.p)
        self.sponge.absorb([int(label) % cfg.p])

    def _absorb_affine(self, g: Affine) -> None:
        if g is None:
            self.sponge.absorb([0])
            self.sponge.absorb([0])
        else:
            self.sponge.absorb([g[0]])
            self.sponge.absorb([g[1]])

    def absorb_g(self, gs) -> None:
        for g in gs:
            self._absorb_affine(g)

    def absorb_fq(self, xs) -> None:
        for x in xs:
            self.sponge.absorb([x % self.cfg.p])

    def absorb_fr(self, xs) -> None:
        """Absorb scalar-field elements into the base-field sponge.

        If the scalar modulus exceeds the base modulus (Pallas case), split
        into (high 254 bits, low bit) absorbed as two elements; otherwise the
        value embeds directly.
        """
        big_scalar = self.cfg.r > self.cfg.p
        for x in xs:
            x %= self.cfg.r
            if big_scalar:
                self.sponge.absorb([x >> 1])
                self.sponge.absorb([x & 1])
            else:
                self.sponge.absorb([x])

    def challenge(self) -> int:
        """Squeeze a scalar-field challenge from the base-field sponge."""
        out = self.sponge.squeeze()
        if self.cfg.r < self.cfg.p:
            return out >> 1  # drop low bit so the value fits in the smaller field
        return out  # base element always < scalar modulus here

    def reset(self) -> None:
        self.sponge.reset()


def hash_message(cfg: CurveCfg, pk: Affine, r_point: Affine, msg_fields) -> int:
    """Schnorr message hash e = H_poseidon(SIGNATURE || pk || R || m).

    Mirrors reference crates/schnorr/src/lib.rs hash_message.
    """
    sponge = Sponge(Protocols.SIGNATURE, cfg)
    sponge.absorb_g([pk, r_point])
    sponge.absorb_fq(msg_fields)
    return sponge.challenge()

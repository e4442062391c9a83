"""Schnorr signatures over the Pasta curves with Poseidon message hashing.

Mirrors reference crates/schnorr/src/lib.rs:11-80:
  keygen: pk = sk*G;  sign: R = k*G, e = H(SIGNATURE || pk || R || m),
  s = k + e*sk;  verify: s*G == R + e*pk.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

from .curves import Affine, CurveCfg, ec_add, ec_mul
from .poseidon.sponge import hash_message


@dataclass(frozen=True)
class SchnorrSignature:
    r: Affine  # commitment point R = k*G
    s: int  # s = k + e*sk (scalar field)


def generate_keypair(cfg: CurveCfg, rng=secrets) -> tuple[int, Affine]:
    sk = rng.randbelow(cfg.r - 1) + 1 if hasattr(rng, "randbelow") else rng.randrange(1, cfg.r)
    pk = ec_mul(cfg, cfg.generator, sk)
    return sk, pk


def sign(cfg: CurveCfg, sk: int, message: list[int], k: int | None = None) -> SchnorrSignature:
    if k is None:
        k = secrets.randbelow(cfg.r - 1) + 1
    r_point = ec_mul(cfg, cfg.generator, k)
    pk = ec_mul(cfg, cfg.generator, sk)
    e = hash_message(cfg, pk, r_point, message)
    s = (k + e * sk) % cfg.r
    return SchnorrSignature(r=r_point, s=s)


def sign_batch(cfg: CurveCfg, sk: int, messages: list[list[int]],
               rng=secrets) -> list[SchnorrSignature]:
    """Sign many same-length messages under one key: per-signature nonces,
    one lockstep batch hash, one C++ scalar-mul per commitment point."""
    from . import native
    from .ops.schnorr_batch import hash_message_batch

    n = len(messages)
    pk = ec_mul(cfg, cfg.generator, sk)
    ks = [(rng.randbelow(cfg.r - 1) + 1) if hasattr(rng, "randbelow")
          else rng.randrange(1, cfg.r) for _ in range(n)]
    if native.available():
        rs = [native.msm(cfg, [k], [cfg.generator]) for k in ks]
    else:
        rs = [ec_mul(cfg, cfg.generator, k) for k in ks]
    es = hash_message_batch(cfg, pk, rs, messages)
    return [SchnorrSignature(r=r, s=(k + e * sk) % cfg.r)
            for r, k, e in zip(rs, ks, es)]


def verify_batch(cfg: CurveCfg, pk: Affine, messages: list[list[int]],
                 sigs: list[SchnorrSignature]) -> list[bool]:
    """Per-signature verification of N signatures under one key as a single
    device dispatch (lockstep Poseidon transcripts + fixed-base dual-mul;
    ops/schnorr_batch.py).  Semantics match calling verify() N times."""
    from .ops.schnorr_batch import verify_batch as _vb

    return _vb(cfg, pk, messages, sigs)


def verify(cfg: CurveCfg, pk: Affine, message: list[int], sig: SchnorrSignature) -> bool:
    e = hash_message(cfg, pk, sig.r, message)
    from . import native

    if native.available():
        # s*G - e*pk == R as one 2-term MSM on the C++ tier
        diff = native.msm(cfg, [sig.s, (-e) % cfg.r], [cfg.generator, pk])
        return diff == sig.r
    lhs = ec_mul(cfg, cfg.generator, sig.s)
    rhs = ec_add(cfg, sig.r, ec_mul(cfg, pk, e))
    return lhs == rhs

"""Host-tier Pasta field arithmetic (exact, python-int based).

This is the orchestration-tier ("H" in SURVEY.md §2) implementation of the
Pasta prime fields.  It mirrors the semantics of the reference's arkworks
field layer (reference: crates/group/src/wrappers.rs:524-525,585-586 for the
moduli) but is a from-scratch implementation on python integers.  The bulk
device tier lives in halo_tpu/ops/ff.py as limb-decomposed JAX arrays; both
tiers are cross-checked in tests/test_ff.py.

Naming follows the reference (crates/group/src/lib.rs:8-9):
  Fp = scalar field of Pallas = base field of Vesta   (modulus FP_MOD)
  Fq = base field of Pallas = scalar field of Vesta   (modulus FQ_MOD)
"""

from __future__ import annotations

# Pallas base field modulus (ark_pallas::Fq): 2^254 + 45560315531419706090280762371685220353
FQ_MOD = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
# Pallas scalar field modulus (ark_pallas::Fr): 2^254 + 45560315531506369815346746415080538113
FP_MOD = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001

# Montgomery radix used by arkworks' 4x64-bit representation.  The reference's
# serialized artifacts (SRS .bin blocks, poseidon constants) store values in
# this Montgomery form (crates/group/src/wrappers.rs:601-617 uses the raw
# internal BigInt of ark field elements).
R256 = 1 << 256

# Both Pasta fields are highly 2-adic: p - 1 = 2^32 * t with t odd.
TWO_ADICITY = 32


def inv(x: int, m: int) -> int:
    """Modular inverse; raises ZeroDivisionError on 0."""
    return pow(x, -1, m)


def from_mont(limbs_or_int, m: int) -> int:
    """Convert a Montgomery-form value (R=2^256) to a canonical int."""
    if isinstance(limbs_or_int, int):
        v = limbs_or_int
    else:  # sequence of 4 u64 little-endian limbs
        v = 0
        for i, limb in enumerate(limbs_or_int):
            v |= int(limb) << (64 * i)
    return v * pow(R256, -1, m) % m


def to_mont(x: int, m: int) -> int:
    return x * R256 % m


def to_limbs64(x: int) -> tuple[int, int, int, int]:
    mask = (1 << 64) - 1
    return (x & mask, (x >> 64) & mask, (x >> 128) & mask, (x >> 192) & mask)


class _SqrtCtx:
    """Tonelli-Shanks context for a fixed modulus (2-adicity 32)."""

    def __init__(self, m: int):
        self.m = m
        t = m - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.s = s
        self.t = t
        # find a quadratic non-residue
        z = 2
        while pow(z, (m - 1) // 2, m) != m - 1:
            z += 1
        self.root_of_unity = pow(z, t, m)


_SQRT_CACHE: dict[int, _SqrtCtx] = {}


def sqrt(x: int, m: int) -> int | None:
    """Tonelli-Shanks square root; returns None if x is a non-residue."""
    x %= m
    if x == 0:
        return 0
    if pow(x, (m - 1) // 2, m) != 1:
        return None
    ctx = _SQRT_CACHE.get(m)
    if ctx is None:
        ctx = _SqrtCtx(m)
        _SQRT_CACHE[m] = ctx
    mspec = ctx.m
    c = ctx.root_of_unity
    r = pow(x, (ctx.t + 1) // 2, mspec)
    tv = pow(x, ctx.t, mspec)
    mexp = ctx.s
    while tv != 1:
        # find least i, 0 < i < mexp, with tv^(2^i) == 1
        i = 0
        t2 = tv
        while t2 != 1:
            t2 = t2 * t2 % mspec
            i += 1
        b = pow(c, 1 << (mexp - i - 1), mspec)
        r = r * b % mspec
        c = b * b % mspec
        tv = tv * c % mspec
        mexp = i
    return r


def two_adic_root_of_unity(m: int, log_n: int) -> int:
    """Primitive 2^log_n-th root of unity matching ark-poly's generator choice.

    ark-ff derives the group generator from the field's TWO_ADIC_ROOT_OF_UNITY
    constant, which is GENERATOR^t where GENERATOR is the smallest multiplicative
    generator (5 for both Pasta fields).
    """
    assert log_n <= TWO_ADICITY
    t = (m - 1) >> TWO_ADICITY
    w = pow(_field_generator(m), t, m)  # primitive 2^32 root
    for _ in range(TWO_ADICITY - log_n):
        w = w * w % m
    return w


def _field_generator(m: int) -> int:
    # Smallest multiplicative generator; 5 for both Pasta fields (matches
    # arkworks' GENERATOR for ark_pallas::Fq/Fr).
    g = 5
    assert m in (FP_MOD, FQ_MOD)
    return g

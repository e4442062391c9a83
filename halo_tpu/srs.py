"""SRS (public parameters) loading for the Pasta curves.

The reference ships the SRS as bincode-v2 (varint) encoded blocks of
Montgomery-form affine points (crates/group/src/pp.rs, build.rs,
.precompute/{pallas,vesta}/gs-NN.bin + sh.bin; 64 blocks x 16384 points).
Those files are the bit-exact ground truth (the generation formula in
crates/group/src/main.rs:113-116 makes overlapping blocks, so we parse the
shipped files rather than regenerate).

Decoded points are cached as numpy u16-limb arrays (structure-of-arrays:
x[N,16], y[N,16] little-endian 16-bit limbs) ready to ship to the device
tier, plus python-int access for the host tier.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

import numpy as np

from .curves import PALLAS, VESTA, Affine, CurveCfg
from .fields import R256, from_mont

REFERENCE_PRECOMPUTE = Path(
    os.environ.get("HALO_TPU_SRS_DIR", "/root/reference/crates/group/.precompute")
)
CACHE_DIR = Path(os.environ.get("HALO_TPU_CACHE", Path(__file__).resolve().parents[1] / ".cache"))

N_MAX = 1 << 20
G_BLOCKS_NO = 64
G_BLOCKS_SIZE = N_MAX // G_BLOCKS_NO

NUM_LIMBS16 = 16  # 256 bits as 16-bit limbs


def _decode_varints(buf: np.ndarray, count: int, offset: int) -> tuple[np.ndarray, int]:
    """Decode `count` bincode-v2 varint u64s starting at offset.

    Fast path: in these files nearly every limb is >= 2^32 (Montgomery form)
    and is encoded as 0xFD + 8 LE bytes.  We detect runs of 0xFD markers and
    decode them vectorized; fall back to scalar decode otherwise.
    """
    out = np.empty(count, dtype=np.uint64)
    i = 0
    pos = offset
    n = len(buf)
    while i < count:
        # vectorized run of 9-byte encodings
        remaining = count - i
        max_run = min(remaining, (n - pos) // 9)
        if max_run > 0 and buf[pos] == 0xFD:
            markers = buf[pos : pos + max_run * 9 : 9]
            run = int(np.argmin(markers == 0xFD)) if not (markers == 0xFD).all() else max_run
            if run > 0:
                chunk = buf[pos : pos + run * 9].reshape(run, 9)[:, 1:]
                out[i : i + run] = chunk.copy().view("<u8").ravel()
                i += run
                pos += run * 9
                continue
        b = int(buf[pos])
        pos += 1
        if b < 0xFB:
            out[i] = b
        elif b == 0xFB:
            out[i] = int.from_bytes(bytes(buf[pos : pos + 2]), "little")
            pos += 2
        elif b == 0xFC:
            out[i] = int.from_bytes(bytes(buf[pos : pos + 4]), "little")
            pos += 4
        elif b == 0xFD:
            out[i] = int.from_bytes(bytes(buf[pos : pos + 8]), "little")
            pos += 8
        else:
            raise ValueError(f"unsupported varint marker {b:#x}")
        i += 1
    return out, pos


def _decode_varint_scalar(buf: np.ndarray, offset: int) -> tuple[int, int]:
    b = int(buf[offset])
    if b < 0xFB:
        return b, offset + 1
    width = {0xFB: 2, 0xFC: 4, 0xFD: 8}[b]
    return int.from_bytes(bytes(buf[offset + 1 : offset + 1 + width]), "little"), offset + 1 + width


def _limbs64_from_mont_batch(limbs: np.ndarray, m: int) -> np.ndarray:
    """(N,4) u64 Montgomery limbs -> (N,16) u16 canonical limbs (via python ints)."""
    n = limbs.shape[0]
    rinv = pow(R256, -1, m)
    raw = limbs.astype("<u8").tobytes()  # N*32 bytes LE
    out = np.empty((n, NUM_LIMBS16), dtype=np.uint16)
    for i in range(n):
        v = int.from_bytes(raw[i * 32 : (i + 1) * 32], "little")
        v = v * rinv % m
        out[i] = np.frombuffer(v.to_bytes(32, "little"), dtype="<u2")
    return out


@dataclass
class PublicParams:
    cfg: CurveCfg
    S: Affine
    H: Affine
    D: int
    gs_x: np.ndarray  # (N,16) u16 canonical limbs
    gs_y: np.ndarray

    def __len__(self) -> int:
        return self.gs_x.shape[0]

    def g_affine(self, i: int) -> Affine:
        x = int.from_bytes(self.gs_x[i].tobytes(), "little")
        y = int.from_bytes(self.gs_y[i].tobytes(), "little")
        return (x, y)

    def gs_ints(self, n: int) -> list[Affine]:
        xraw = self.gs_x[:n].tobytes()
        yraw = self.gs_y[:n].tobytes()
        return [
            (
                int.from_bytes(xraw[32 * i : 32 * i + 32], "little"),
                int.from_bytes(yraw[32 * i : 32 * i + 32], "little"),
            )
            for i in range(n)
        ]


def _derive_generator(cfg: CurveCfg, i: int) -> Affine:
    """SRS generator i from scratch: G * (SHA3-256(i_le || genesis) mod r)
    (reference crates/group/src/main.rs:55-68; used when the reference
    .precompute mount is absent, e.g. on a bare CI runner)."""
    import hashlib

    from .curves import ec_mul

    h = hashlib.sha3_256()
    h.update(int(i).to_bytes(8, "little"))
    h.update(b"To understand recursion, one must first understand recursion")
    return ec_mul(cfg, cfg.generator, int.from_bytes(h.digest(), "little") % cfg.r)


def _have_reference() -> bool:
    return REFERENCE_PRECOMPUTE.exists()


@lru_cache(maxsize=4)
def load_sh(cfg_name: str) -> tuple[Affine, Affine]:
    """Parse only S and H (sh.bin) — enough for succinct checks."""
    cfg = PALLAS if cfg_name == "pallas" else VESTA
    if not _have_reference():
        return _derive_generator(cfg, 0), _derive_generator(cfg, 1)
    sh_buf = np.frombuffer((REFERENCE_PRECOMPUTE / cfg.name / "sh.bin").read_bytes(), np.uint8)
    sh_limbs, _ = _decode_varints(sh_buf, 16, 0)
    vals = [from_mont([int(x) for x in sh_limbs[i * 4 : i * 4 + 4]], cfg.p) for i in range(4)]
    return (vals[0], vals[1]), (vals[2], vals[3])


def _load_block(cfg: CurveCfg, block: int) -> np.ndarray:
    """Parse one gs-NN.bin -> (16384, 8) u64 Montgomery limbs (x then y)."""
    path = REFERENCE_PRECOMPUTE / cfg.name / f"gs-{block:02d}.bin"
    buf = np.frombuffer(path.read_bytes(), dtype=np.uint8)
    count, pos = _decode_varint_scalar(buf, 0)
    limbs, pos = _decode_varints(buf, count * 8, pos)
    assert pos == len(buf), f"trailing bytes in {path}"
    return limbs.reshape(count, 8)


def _npz_cache_path(cfg: CurveCfg, n: int) -> Path:
    return CACHE_DIR / f"srs-{cfg.name}-{n}.npz"


@lru_cache(maxsize=4)
def load_srs(cfg_name: str, n: int = N_MAX) -> PublicParams:
    """Load (and cache) the first n generators + S,H for a curve."""
    assert n & (n - 1) == 0 and n <= N_MAX
    cfg = PALLAS if cfg_name == "pallas" else VESTA

    cache = _npz_cache_path(cfg, n)
    if cache.exists():
        z = np.load(cache)
        sh = [int.from_bytes(z["sh"][i].tobytes(), "little") for i in range(4)]
        return PublicParams(
            cfg=cfg,
            S=(sh[0], sh[1]),
            H=(sh[2], sh[3]),
            D=n - 1,
            gs_x=z["gs_x"],
            gs_y=z["gs_y"],
        )

    if not _have_reference():
        # Bootstrap on a bare runner (the reference's `bootstrap` cargo
        # feature analog, crates/group/build.rs:84-101): derive S (idx 0),
        # H (idx 1) and generators idx b+k+2 per the overlapping-block
        # layout.  Intended for small n (CI); cached in the npz afterwards.
        S = _derive_generator(cfg, 0)
        H = _derive_generator(cfg, 1)
        gx = np.empty((n, NUM_LIMBS16), dtype=np.uint16)
        gy = np.empty((n, NUM_LIMBS16), dtype=np.uint16)
        for j in range(n):
            b, k = divmod(j, G_BLOCKS_SIZE)
            pt = _derive_generator(cfg, b + k + 2)
            gx[j] = np.frombuffer(int(pt[0]).to_bytes(32, "little"), dtype="<u2")
            gy[j] = np.frombuffer(int(pt[1]).to_bytes(32, "little"), dtype="<u2")
        CACHE_DIR.mkdir(parents=True, exist_ok=True)
        sh_arr = np.stack(
            [np.frombuffer(int(v).to_bytes(32, "little"), dtype="<u2")
             for v in (S[0], S[1], H[0], H[1])])
        np.savez_compressed(cache, sh=sh_arr, gs_x=gx, gs_y=gy)
        return PublicParams(cfg=cfg, S=S, H=H, D=n - 1, gs_x=gx, gs_y=gy)

    # sh.bin: tuple (S, H) of WrappedPoint (8 varint u64 each)
    sh_buf = np.frombuffer((REFERENCE_PRECOMPUTE / cfg.name / "sh.bin").read_bytes(), np.uint8)
    sh_limbs, _ = _decode_varints(sh_buf, 16, 0)
    svals = [from_mont([int(x) for x in sh_limbs[i * 4 : i * 4 + 4]], cfg.p) for i in range(4)]
    S = (svals[0], svals[1])
    H = (svals[2], svals[3])

    remaining = n
    xs, ys = [], []
    block = 0
    while remaining > 0:
        limbs = _load_block(cfg, block)
        take = min(remaining, limbs.shape[0])
        xs.append(_limbs64_from_mont_batch(limbs[:take, 0:4], cfg.p))
        ys.append(_limbs64_from_mont_batch(limbs[:take, 4:8], cfg.p))
        remaining -= take
        block += 1
    gs_x = np.concatenate(xs, axis=0)
    gs_y = np.concatenate(ys, axis=0)

    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    sh_arr = np.stack(
        [np.frombuffer(v.to_bytes(32, "little"), dtype="<u2") for v in (S[0], S[1], H[0], H[1])]
    )
    np.savez_compressed(cache, sh=sh_arr, gs_x=gs_x, gs_y=gs_y)
    return PublicParams(cfg=cfg, S=S, H=H, D=n - 1, gs_x=gs_x, gs_y=gs_y)

"""SRS bootstrap generator: derive and serialize the public parameters.

The TPU-build equivalent of the reference's group binary
(crates/group/src/main.rs:55-134): generator i is
    G * (SHA3-256(i as u64 LE || "To understand recursion, one must first
    understand recursion") interpreted little-endian mod r)
with S = index 0, H = index 1, and G block b holding indices b+k+2 for
k in 0..16384 (NOTE: the reference's blocks overlap — block b starts at
b+2, not b*16384+2; the shipped .bin files are ground truth and this tool
reproduces them byte-for-byte, bug included).

Serialization is bincode-v2 standard config: Vec = varint length + items;
WrappedPoint = 8 varint u64s (x, y as 4x64-bit Montgomery limbs).

Usage:
    python tools/gen_srs.py --curve pallas --blocks 1 --out /tmp/srs
    python tools/gen_srs.py --verify            # byte-compare vs shipped bins
"""

from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from halo_tpu.curves import PALLAS, VESTA, CurveCfg, ec_mul
from halo_tpu.fields import R256

GENESIS = b"To understand recursion, one must first understand recursion"
G_BLOCKS_NO = 64
G_BLOCKS_SIZE = (1 << 20) // G_BLOCKS_NO
REF_PRECOMPUTE = Path("/root/reference/crates/group/.precompute")


def generator_hash(cfg: CurveCfg, i: int):
    h = hashlib.sha3_256()
    h.update(i.to_bytes(8, "little"))
    h.update(GENESIS)
    scalar = int.from_bytes(h.digest(), "little") % cfg.r
    return ec_mul(cfg, cfg.generator, scalar)


def _varint_u64(v: int) -> bytes:
    if v < 0xFB:
        return bytes([v])
    if v < 1 << 16:
        return b"\xfb" + v.to_bytes(2, "little")
    if v < 1 << 32:
        return b"\xfc" + v.to_bytes(4, "little")
    return b"\xfd" + v.to_bytes(8, "little")


def _wrapped_point(cfg: CurveCfg, pt) -> bytes:
    """WrappedPoint {x: [u64;4], y: [u64;4]} in Montgomery form."""
    out = bytearray()
    for coord in pt:
        mont = coord * R256 % cfg.p
        for limb in range(4):
            out += _varint_u64((mont >> (64 * limb)) & 0xFFFFFFFFFFFFFFFF)
    return bytes(out)


def encode_sh(cfg: CurveCfg) -> bytes:
    s = generator_hash(cfg, 0)
    h = generator_hash(cfg, 1)
    return _wrapped_point(cfg, s) + _wrapped_point(cfg, h)


def encode_block(cfg: CurveCfg, block: int, size: int = G_BLOCKS_SIZE) -> bytes:
    out = bytearray(_varint_u64(size))
    for k in range(size):
        out += _wrapped_point(cfg, generator_hash(cfg, block + k + 2))
    return bytes(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", choices=["pallas", "vesta"], default="pallas")
    ap.add_argument("--blocks", type=int, default=1)
    ap.add_argument("--out", type=Path, default=Path("/tmp/srs"))
    ap.add_argument("--verify", action="store_true",
                    help="byte-compare sh.bin + the first 256 points of "
                         "block 0 against the shipped reference bins")
    args = ap.parse_args()
    cfg = PALLAS if args.curve == "pallas" else VESTA

    if args.verify:
        for name, c in (("pallas", PALLAS), ("vesta", VESTA)):
            ref_sh = (REF_PRECOMPUTE / name / "sh.bin").read_bytes()
            ours = encode_sh(c)
            assert ours == ref_sh, f"{name}/sh.bin mismatch"
            print(f"{name}/sh.bin: byte-identical ({len(ours)} bytes)")
            ref_g0 = (REF_PRECOMPUTE / name / "gs-00.bin").read_bytes()
            n_check = 256
            ours_prefix = bytearray(_varint_u64(G_BLOCKS_SIZE))
            for k in range(n_check):
                ours_prefix += _wrapped_point(c, generator_hash(c, 0 + k + 2))
            assert ref_g0.startswith(bytes(ours_prefix)), f"{name}/gs-00.bin prefix mismatch"
            print(f"{name}/gs-00.bin: first {n_check} points byte-identical")
        return

    args.out.joinpath(args.curve).mkdir(parents=True, exist_ok=True)
    sh_path = args.out / args.curve / "sh.bin"
    sh_path.write_bytes(encode_sh(cfg))
    print(f"wrote {sh_path}")
    for b in range(args.blocks):
        path = args.out / args.curve / f"gs-{b:02}.bin"
        path.write_bytes(encode_block(cfg, b))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

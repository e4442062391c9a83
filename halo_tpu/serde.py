"""ark-serialize compatible codecs for reference fixtures and proofs.

Implements the subset of arkworks' CanonicalSerialize/Deserialize needed to
exchange objects with the reference implementation bit-exactly:

  * PrimeField: 32 LE bytes, canonical form
  * short-Weierstrass points, compressed: x as 32 LE bytes with flags in the
    two MSBs of the last byte (bit7 = infinity, bit6 = y-is-negative, where
    "negative" means y > p - y); infinity serializes x = 0
  * u64/usize: 8 LE bytes;  Vec<T>: u64 length + items;  Option<T>: u8 tag
  * structs: fields in declaration order

Used to parse /root/reference/crates/accumulation/.precompute/qs.bin
(Vec<(usize, Instance, Accumulator)>, reference accumulation/src/main.rs:76-81)
and to serialize our own proofs for byte-level comparison.
"""

from __future__ import annotations

from dataclasses import dataclass

from .curves import Affine, CurveCfg, decompress_point


class Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bytes(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        assert len(out) == n, "unexpected EOF"
        self.pos += n
        return out

    def u8(self) -> int:
        return self.bytes(1)[0]

    def u64(self) -> int:
        return int.from_bytes(self.bytes(8), "little")

    def field(self, m: int) -> int:
        v = int.from_bytes(self.bytes(32), "little")
        assert v < m, "non-canonical field element"
        return v

    def point_compressed(self, cfg: CurveCfg) -> Affine:
        # 255-bit modulus + 2 flag bits => 33 bytes; flags in MSBs of last byte
        raw = bytearray(self.bytes(33))
        flags = raw[32] >> 6
        raw[32] &= 0x3F
        x = int.from_bytes(bytes(raw), "little")
        if flags & 0b01:  # bit6 = infinity
            assert x == 0
            return None
        return decompress_point(cfg, x, y_is_negative=bool(flags & 0b10))  # bit7 = neg y

    def option(self, parse) -> object | None:
        tag = self.u8()
        if tag == 0:
            return None
        assert tag == 1
        return parse()

    def vec(self, parse) -> list:
        return [parse() for _ in range(self.u64())]

    def done(self) -> bool:
        return self.pos == len(self.data)


class Writer:
    def __init__(self):
        self.out = bytearray()

    def bytes_(self, b: bytes) -> None:
        self.out += b

    def u8(self, v: int) -> None:
        self.out.append(v)

    def u64(self, v: int) -> None:
        self.out += v.to_bytes(8, "little")

    def field(self, v: int) -> None:
        self.out += v.to_bytes(32, "little")

    def point_compressed(self, cfg: CurveCfg, pt: Affine) -> None:
        if pt is None:
            raw = bytearray(33)
            raw[32] |= 0x40  # bit6 = infinity
            self.out += raw
            return
        x, y = pt
        raw = bytearray(x.to_bytes(33, "little"))
        if y > cfg.p - y:
            raw[32] |= 0x80  # bit7 = negative y
        self.out += raw

    def option(self, v, write) -> None:
        if v is None:
            self.u8(0)
        else:
            self.u8(1)
            write(v)

    def vec(self, items, write) -> None:
        self.u64(len(items))
        for it in items:
            write(it)

    def data(self) -> bytes:
        return bytes(self.out)

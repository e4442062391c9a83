"""Bench fixture generator: (n, Instance, Accumulator) tuples, ark-encoded.

The TPU-build equivalent of the reference's accumulation binary
(crates/accumulation/src/main.rs:23-92), which serializes
Vec<(usize, Instance, Accumulator)> for n = 2^min..2^max into qs.bin for
the criterion benches.  Uses the same ark-serialize layout our serde
implements, so the output parses with halo_tpu.serde the same way the
reference's shipped qs.bin does (tests/test_fixtures.py).

Usage: python tools/gen_fixtures.py [--min 2] [--max 10] [--out /tmp/qs.bin]
"""

from __future__ import annotations

import argparse
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from halo_tpu import acc as acc_mod
from halo_tpu import pcdl
from halo_tpu.curves import PALLAS
from halo_tpu.serde import Writer


def gen_entry(n: int, rng) -> tuple[int, pcdl.Instance, acc_mod.Accumulator]:
    """gen_q + gen_acc (accumulation/src/main.rs:23-57), non-hiding."""
    p = [rng.randrange(PALLAS.r) for _ in range(n)]
    z = rng.randrange(PALLAS.r)
    q = pcdl.Instance.open(PALLAS, p, n - 1, z, w=None)
    accumulator = acc_mod.prover(PALLAS, [q])
    return n, q, accumulator


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=int, default=2)
    ap.add_argument("--max", type=int, default=10)
    ap.add_argument("--out", type=Path, default=Path("/tmp/qs.bin"))
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    w = Writer()
    sizes = [1 << k for k in range(args.min, args.max + 1)]
    w.u64(len(sizes))
    for n in sizes:
        t0 = time.time()
        n_out, q, accumulator = gen_entry(n, rng)
        w.u64(n_out)
        q.serialize(w, PALLAS)
        accumulator.serialize(w, PALLAS)
        print(f"n=2^{n.bit_length() - 1}: {time.time() - t0:.2f}s")
    args.out.write_bytes(w.data())
    print(f"wrote {args.out} ({args.out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()

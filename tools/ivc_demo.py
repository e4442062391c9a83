"""IVC end-to-end demo: Schnorr throughput + a chain of IVC steps.

The TPU-native equivalent of the reference's plonk binary
(crates/plonk/src/main.rs:31-87): benchmark naive Schnorr verification,
then run init -> prove -> verify for N recursion steps over the Pasta
2-cycle at the frozen 2^16-row IVC circuit, printing per-phase wall-clock.

Usage:
    python tools/ivc_demo.py [--steps 3] [--rows 65536] [--sigs 2000]

The frozen circuit params come from .cache/ivc-circuits-<rows>.json
(produced by freeze_ivc_circuits, pinned bit-exact against the reference's
IVC_FP_CIRCUIT/IVC_FQ_CIRCUIT in tests/test_ivc_consts.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).resolve().parents[1] / ".cache" / "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# zstd segfaults compressing some large CPU executables (see
# tests/conftest.py); route cache compression to zlib everywhere.
from jax._src import compilation_cache as _jax_cc  # noqa: E402

_jax_cc.zstandard = None
if hasattr(_jax_cc, "zstd"):
    _jax_cc.zstd = None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--sigs", type=int, default=2000)
    args = ap.parse_args()

    import random

    from halo_tpu import schnorr
    from halo_tpu.curves import PALLAS
    from halo_tpu.frontend.ivc import IVCState, freeze_ivc_circuits

    rng = random.Random(17)

    # ---- naive Schnorr verification throughput (main.rs:36-47) ----
    sk = rng.randrange(1, PALLAS.r)
    from halo_tpu.curves import ec_mul

    pk = ec_mul(PALLAS, PALLAS.generator, sk)
    msg = [rng.randrange(PALLAS.r) for _ in range(10)]
    sig = schnorr.sign(PALLAS, sk, msg, k=rng.randrange(1, PALLAS.r))
    t0 = time.time()
    for _ in range(args.sigs):
        assert schnorr.verify(PALLAS, pk, msg, sig)
    dt = time.time() - t0
    print(f"Verified {args.sigs / dt:.1f} signatures per second", flush=True)

    # ---- IVC chain ----
    t0 = time.time()
    params = freeze_ivc_circuits(args.rows)
    print(f"freeze_ivc_circuits({args.rows}) took {time.time() - t0:.1f} s "
          f"(cached={Path('.cache/ivc-circuits-%d.json' % args.rows).exists()})", flush=True)

    t0 = time.time()
    state = IVCState.init(params)
    print(f"IVC Init took {time.time() - t0:.1f} s", flush=True)

    t0 = time.time()
    state.verify()
    print(f"(0) IVC Verifier took {time.time() - t0:.1f} s", flush=True)

    from halo_tpu.curves import VESTA

    for i in range(args.steps):
        t0 = time.time()
        state = state.prove()
        prove_s = time.time() - t0

        # proof-size accounting (thesis 08-benchmarks/index.md:79-90:
        # ~10 kB per step = both curves' proofs)
        fp_bytes = len(state.fp_proof.to_bytes(PALLAS))
        fq_bytes = len(state.fq_proof.to_bytes(VESTA))
        print(f"({i} -> {i + 1}) IVC Prover took {prove_s:.1f} s "
              f"(proof {fp_bytes} + {fq_bytes} = {fp_bytes + fq_bytes} bytes)",
              flush=True)

        t0 = time.time()
        state.verify()
        print(f"({i + 1}) IVC Verifier took {time.time() - t0:.1f} s", flush=True)

    print("IVC chain OK")


if __name__ == "__main__":
    main()

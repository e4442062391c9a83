"""Sharded-MSM scaling measurement on a virtual device mesh.

Measures the multi-chip MSM path (per-chip Pippenger + recursive-doubling
ppermute reduction, halo_tpu/parallel/msm.py) at mesh sizes 1/2/4/8 on the
CPU host platform.  NOTE (honesty): with virtual devices on a shared host
CPU this measures partitioning + collective OVERHEAD and correctness, not
real speedup — all "devices" share the same cores.  On a real TPU slice the
same script reports true scaling efficiency (BASELINE target: >= 70% at 2+
hosts).

Runs single-process; invoke with:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py [--log-n 14] [--iters 3]

Writes one JSON line per mesh size to stdout and a summary to
BENCH_SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.modules.setdefault("zstandard", None)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=14)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from halo_tpu import native
    from halo_tpu.curves import PALLAS
    from halo_tpu.ops import ec, ff
    from halo_tpu.parallel import mesh as pmesh
    from halo_tpu.parallel import msm as pmsm
    from halo_tpu.srs import load_srs

    n = 1 << args.log_n
    cfg = PALLAS
    ctx = ec.ec_ctx(cfg)
    pp = load_srs("pallas", n)
    pts = pp.gs_ints(n)
    P = ec.from_limbs_canonical(ctx, pp.gs_x[:n], pp.gs_y[:n])

    rng = np.random.default_rng(5)
    Ks = []
    for _ in range(args.iters + 1):
        K = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
        K[:, 15] &= 0x3FFF
        Ks.append(K)

    def k_ints(K):
        K64 = K.astype(np.uint64)
        words = K64[:, 0::4] | (K64[:, 1::4] << 16) | (K64[:, 2::4] << 32) | (K64[:, 3::4] << 48)
        return [int(w[0]) | int(w[1]) << 64 | int(w[2]) << 128 | int(w[3]) << 192 for w in words]

    results = []
    lanes = 128
    base_time = None
    for d in (1, 2, 4, 8):
        if d > len(jax.devices()):
            break
        mesh = pmesh.data_mesh(d)
        fn = pmsm.sharded_msm_fn(ctx, mesh, lanes, naive=False)

        def run(K):
            X, Y, Z = (pmesh.shard_leading(mesh, c) for c in P)
            Kd = pmesh.shard_leading(mesh, jnp.asarray(K))
            out = fn(X, Y, Z, Kd)
            return jax.device_get(out)

        t0 = time.time()
        out = run(Ks[0])
        compile_s = time.time() - t0
        times = []
        for i in range(1, args.iters + 1):
            t0 = time.time()
            out = run(Ks[i])
            times.append(time.time() - t0)
        best = min(times)

        got = ec.to_affine_ints(ctx, tuple(np.asarray(c)[None] for c in out))[0]
        want = native.msm(cfg, k_ints(Ks[args.iters]), pts)
        verified = got == want

        if d == 1:
            base_time = best
        eff = base_time / (best * d) if base_time else None
        row = {"mesh": d, "n": n, "best_s": round(best, 4), "compile_s": round(compile_s, 1),
               "points_per_s": round(n / best, 1), "verified": verified,
               "parallel_efficiency_vs_1dev": round(eff, 3) if eff else None}
        results.append(row)
        print(json.dumps(row), flush=True)

    out_path = Path(__file__).resolve().parents[1] / "BENCH_SCALING.json"
    out_path.write_text(json.dumps({
        "note": "virtual CPU mesh: measures sharding+collective overhead and "
                "correctness, not real multi-chip speedup (all devices share "
                "the host cores); run on a real slice for true scaling",
        "results": results,
    }, indent=1))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Headline benchmark: single-chip MSM throughput at 2^20 points.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against arkworks' rayon Pippenger on the reference's
benchmark machine (~1.5 s for a 2^20 MSM on 20 threads => ~7.0e5 points/s;
the thesis publishes no direct MSM number, so this is the IVC-prover-derived
estimate — see BASELINE.md).

Env knobs: HALO_BENCH_N (default 1<<20), HALO_BENCH_ITERS (default 3).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".cache", "jax")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_MSM_POINTS_PER_S = 7.0e5


def main() -> None:
    n = int(os.environ.get("HALO_BENCH_N", 1 << 20))
    iters = int(os.environ.get("HALO_BENCH_ITERS", 3))

    from halo_tpu.curves import PALLAS
    from halo_tpu.ops import ec, ff
    from halo_tpu.ops import msm as msm_ops
    from halo_tpu.srs import load_srs

    print(f"bench: devices={jax.devices()}", file=sys.stderr)
    pp = load_srs("pallas", n)
    ctx = ec.ec_ctx(PALLAS)
    P = ec.from_limbs_canonical(ctx, pp.gs_x[:n], pp.gs_y[:n])

    rng = np.random.default_rng(1234)
    # random 254-bit scalars as 16-bit limbs (top limb masked to stay < r)
    K = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    K[:, 15] &= 0x3FFF
    K = jnp.asarray(K)

    lanes = 512 if n >= (1 << 16) else 128
    t0 = time.time()
    out = msm_ops.pippenger_jit(ctx, P, K, lanes)
    jax.block_until_ready(out)
    print(f"bench: first run (incl. compile) {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(iters):
        t0 = time.time()
        out = msm_ops.pippenger_jit(ctx, P, K, lanes)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    pps = n / best
    print(f"bench: msm n={n} best={best:.3f}s ({pps:.3e} points/s)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"msm_pippenger_2^{n.bit_length() - 1}_points_per_s",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / REFERENCE_MSM_POINTS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

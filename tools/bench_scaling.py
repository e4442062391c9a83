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

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".cache" / "jax-tests"))
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
    ap.add_argument("--log-n", type=int, default=14)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tier", choices=("v1", "v2"), default="v2",
                    help="v2 (default): per-chip scatter-free signed-digit "
                         "Pippenger (ops/msm2.py) inside shard_map, window "
                         "aggregates ring-reduced; v1: the jnp-tier kernels")
    ap.add_argument("--multihost", action="store_true",
                    help="join a jax.distributed cluster (env JAX_COORDINATOR_"
                         "ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID) and run the "
                         "sharded MSM on the GLOBAL mesh (the DCN code path)")
    ap.add_argument("--out", type=str, default=None,
                    help="summary JSON path (default: the committed repo "
                         "artifact; tests pass a tmp path so they never "
                         "clobber committed evidence)")
    args = ap.parse_args()

    if args.multihost:
        from halo_tpu.parallel import multihost

        multihost.initialize_multihost()
        print(f"multihost: process {multihost.process_index()} of "
              f"{os.environ.get('JAX_NUM_PROCESSES')}, local devices "
              f"{multihost.local_device_count()}, global {len(jax.devices())}",
              file=sys.stderr, flush=True)

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
    mesh_sizes = (len(jax.devices()),) if args.multihost else (1, 2, 4, 8)
    for d in mesh_sizes:
        if d > len(jax.devices()):
            break
        if args.multihost:
            from halo_tpu.parallel import multihost

            mesh = multihost.global_data_mesh()
        else:
            mesh = pmesh.data_mesh(d)
        use_v2 = args.tier == "v2"
        if use_v2:
            from halo_tpu.ops import msm2 as msm2_mod
            from jax.sharding import NamedSharding, PartitionSpec

            xy_pack, _inf = msm2_mod.pack_points(cfg, pts)
            fn2 = pmsm.sharded_msm2_fn(cfg, mesh, n // d)
            sh2 = NamedSharding(mesh, PartitionSpec(None, "data"))
            if args.multihost:
                # multi-controller: each process contributes its local lane
                # slice of the packed rows
                pidx, nproc = jax.process_index(), jax.process_count()
                lo, hi = pidx * n // nproc, (pidx + 1) * n // nproc
                xy_sh = jax.make_array_from_process_local_data(
                    sh2, np.asarray(xy_pack)[:, lo:hi])
            else:
                xy_sh = jax.device_put(xy_pack, sh2)
        else:
            fn = pmsm.sharded_msm_fn(ctx, mesh, lanes, naive=(n // d < 4096))

        def run(K):
            if use_v2:
                Krows = np.asarray(K).T
                if args.multihost:
                    pidx, nproc = jax.process_index(), jax.process_count()
                    lo, hi = pidx * n // nproc, (pidx + 1) * n // nproc
                    Kd = jax.make_array_from_process_local_data(
                        sh2, Krows[:, lo:hi])
                else:
                    Kd = jax.device_put(jnp.asarray(Krows), sh2)
                out_cols = fn2(xy_sh, Kd)
                return jax.device_get(out_cols)
            if args.multihost:
                # multi-controller: build each host's shard locally
                from jax.sharding import NamedSharding, PartitionSpec

                sh = NamedSharding(mesh, PartitionSpec("data"))

                pidx = jax.process_index()
                nproc = jax.process_count()
                lo, hi = pidx * n // nproc, (pidx + 1) * n // nproc

                def put(x):
                    return jax.make_array_from_process_local_data(
                        sh, np.asarray(x)[lo:hi])

                X, Y, Z = (put(c) for c in P)
                Kd = put(np.asarray(K))
            else:
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

        if use_v2:
            from halo_tpu.ops import ff as ff_mod

            rows = tuple(np.asarray(c).T.reshape(ff_mod.NLIMBS, -1, 2) for c in out)
            got = msm2_mod._combine_host(cfg, rows, 8)
        else:
            got = ec.to_affine_ints(ctx, tuple(np.asarray(c)[None] for c in out))[0]
        want = native.msm(cfg, k_ints(Ks[args.iters]), pts)
        verified = got == want

        if d == 1:
            base_time = best
        eff = base_time / (best * d) if base_time else None
        row = {"mesh": d, "n": n, "tier": "v2" if use_v2 else "v1",
               "best_s": round(best, 4), "compile_s": round(compile_s, 1),
               "points_per_s": round(n / best, 1), "verified": verified,
               "parallel_efficiency_vs_1dev": round(eff, 3) if eff else None}
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.multihost and jax.process_index() != 0:
        return
    out_path = Path(args.out) if args.out else Path(__file__).resolve().parents[1] / (
        "BENCH_SCALING_MULTIHOST.json" if args.multihost else "BENCH_SCALING.json")
    out_path.write_text(json.dumps({
        "note": "virtual CPU mesh: measures sharding+collective overhead and "
                "correctness, not real multi-chip speedup (all devices share "
                "the host cores); run on a real slice for true scaling",
        "results": results,
    }, indent=1))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Must run before any jax import (SURVEY.md §4: multi-chip paths are tested on
a virtual host-platform device mesh so psum/all_to_all run in CI without
TPUs).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache for tests: round 1/2 disabled this citing
# executable.serialize() segfaults, but the cache was in fact never enabled
# there (jax 0.9 ignores JAX_COMPILATION_CACHE_DIR; it must go through
# jax.config after import) -- the crashes came from elsewhere (see
# pytest.ini on the in-process XLA CPU compile defect).  Re-enabled via
# jax.config below; HALO_TPU_TEST_NO_CACHE=1 opts out.
_test_cache = "" if os.environ.get("HALO_TPU_TEST_NO_CACHE") == "1" else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax-tests")

# The axon sitecustomize force-registers the TPU plugin and overrides
# jax_platforms AFTER env vars are read, so the env alone is not enough —
# pin the platform via jax.config (runs after sitecustomize).  Tests must
# never touch the (single-tenant, tunnel-backed) TPU.
# keep protocol tests on the (predictable) host MSM; device MSM has its own
# dedicated tests and the CPU jit compiles would dominate CI otherwise
os.environ.setdefault("HALO_TPU_DEVICE_MSM_MIN", "100000")
# likewise: protocol/acc tests use the host IPA fold; the device fold has a
# dedicated differential test (test_device_pipeline.py) that calls it directly
os.environ.setdefault("HALO_TPU_DEVICE_OPEN_MIN", "1000000000")

import jax  # noqa: E402

# zstandard.backend_c segfaults compressing some large limb-arithmetic CPU
# executables (reproduced: worker crash with zstandard.backend_c on the
# stack); route the cache's compression to zlib by hiding the module from
# jax._src.compilation_cache (safe: entries self-describe their codec).
from jax._src import compilation_cache as _jax_cc  # noqa: E402

_jax_cc.zstandard = None
if hasattr(_jax_cc, "zstd"):
    _jax_cc.zstd = None

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _test_cache or None)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# XLA:CPU's executable serialize/deserialize SEGFAULTS on some huge
# limb-arithmetic executables (both directions reproduced: a fatal crash in
# put_executable_and_time -> executable.serialize() caching the 2^15-point
# batched-NTT graph of the 2^12-row device prover — the round-3
# "deterministic segfault in test_device_prover_matches_host_2k12" — and a
# second crash in get_executable_and_time -> deserialize_executable loading
# a large previously-written entry).  Guard BOTH directions: skip cache
# WRITES when the HLO is oversized, and treat oversized on-disk entries as
# cache misses; small/medium graphs (the vast majority) still cache.
_HLO_CACHE_CAP_BYTES = 4 << 20
_ENTRY_CACHE_CAP_BYTES = 16 << 20
_orig_put = _jax_cc.put_executable_and_time
_orig_get = _jax_cc.get_executable_and_time


def _guarded_put(cache_key, module_name, executable, backend, compile_time):
    try:
        hlo_bytes = sum(
            len(m.as_serialized_hlo_module_proto()) for m in executable.hlo_modules())
    except Exception:
        hlo_bytes = 0
    if hlo_bytes > _HLO_CACHE_CAP_BYTES:
        return
    return _orig_put(cache_key, module_name, executable, backend, compile_time)


def _guarded_get(cache_key, compile_options, backend, executable_devices):
    cache = _jax_cc._get_cache(backend)
    if cache is not None:
        entry = cache.get(cache_key)
        if entry is not None and len(entry) > _ENTRY_CACHE_CAP_BYTES:
            return None, None
    return _orig_get(cache_key, compile_options, backend, executable_devices)


_jax_cc.put_executable_and_time = _guarded_put
_jax_cc.get_executable_and_time = _guarded_get

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

# persistent compilation cache: the limb-arithmetic graphs are large and
# recompiling them per test process dominates wall-clock otherwise
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".cache", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon sitecustomize force-registers the TPU plugin and overrides
# jax_platforms AFTER env vars are read, so the env alone is not enough —
# pin the platform via jax.config (runs after sitecustomize).  Tests must
# never touch the (single-tenant, tunnel-backed) TPU.
# keep protocol tests on the (predictable) host MSM; device MSM has its own
# dedicated tests and the CPU jit compiles would dominate CI otherwise
os.environ.setdefault("HALO_TPU_DEVICE_MSM_MIN", "100000")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# NOT "all": serializing the XLA-internal caches segfaults sporadically in
# zstd on this jaxlib (observed: Fatal Python error in put_executable_and_time)

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

# NO persistent compilation cache for tests: XLA's CPU executable
# serialization (executable.serialize() in put_executable_and_time)
# reproducibly SEGFAULTS on some of the limb-arithmetic executables
# (observed repeatedly on test_ec.py's from_affine_ints graph).  Wall-clock
# is managed by shape discipline (shared canonical shapes across tests)
# instead.  The TPU backend does not exhibit the crash, so bench.py and
# __graft_entry__.py keep their caches.
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""

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

# The persistent cache compresses entries with zstandard when available, and
# zstandard.backend_c reproducibly SEGFAULTS on this box (observed in both
# _cache_read and put_executable_and_time on the large limb-arithmetic
# executables).  sys.modules["zstandard"] = None is NOT enough: the axon
# sitecustomize imports jax at interpreter startup, before conftest runs, so
# jax._src.compilation_cache has already bound the module global.  Override
# the binding directly to force the zlib path (raises catchable errors
# instead of crashing).
import sys

sys.modules["zstandard"] = None  # for any later importers

import jax  # noqa: E402
from jax._src import compilation_cache as _jax_cc  # noqa: E402

_jax_cc.zstd = None
_jax_cc.zstandard = None

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# NOT "all": serializing the XLA-internal caches segfaults sporadically in
# zstd on this jaxlib (observed: Fatal Python error in put_executable_and_time)

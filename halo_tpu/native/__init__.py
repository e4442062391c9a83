"""ctypes loader for the C++ host-tier kernels (pasta_native.cpp).

Compiles on first import (g++ -O3, cached by source hash under
.cache/native/) and exposes numpy-facing wrappers.  Every caller must keep
a pure-Python fallback: `available()` gates all fast paths, so the
framework still works where a toolchain is missing.

Boundary convention: field elements are canonical (non-Montgomery) ints,
marshalled as (n, 4) uint64 little-endian limb arrays; affine points as
(xs, ys, infs) parallel arrays.  field ids: 0=Fp, 1=Fq.  curve ids:
0=Pallas, 1=Vesta (reference crates/group/src/lib.rs:8-9 naming).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "pasta_native.cpp"
_CACHE = _HERE.parents[1] / ".cache" / "native"

_lib = None
_lib_err: str | None = None
_lock = threading.Lock()

FP, FQ = 0, 1
PALLAS_ID, VESTA_ID = 0, 1


def _build() -> ctypes.CDLL | None:
    global _lib_err
    if os.environ.get("HALO_TPU_NO_NATIVE"):
        _lib_err = "disabled via HALO_TPU_NO_NATIVE"
        return None
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = _CACHE / f"pasta_native-{tag}.so"
    if not so.exists():
        _CACHE.mkdir(parents=True, exist_ok=True)
        # pid-unique tmp: concurrent builders (pytest-xdist workers) must not
        # rename each other's tmp away mid-build
        tmp = so.with_suffix(f".so.{os.getpid()}.tmp")
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-o", str(tmp), str(_SRC), "-pthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
            _lib_err = f"native build failed: {getattr(e, 'stderr', b'') or e}"
            return None
        os.replace(tmp, so)
    try:
        lib = ctypes.CDLL(str(so))
    except OSError as e:
        _lib_err = f"dlopen failed: {e}"
        return None

    u64p = ctypes.POINTER(ctypes.c_uint64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i, z = ctypes.c_int, ctypes.c_size_t
    sigs = {
        "pasta_batch_mul": [i, u64p, u64p, u64p, z],
        "pasta_batch_add": [i, u64p, u64p, u64p, z],
        "pasta_batch_sub": [i, u64p, u64p, u64p, z],
        "pasta_batch_axpy": [i, u64p, u64p, u64p, u64p, z],
        "pasta_scalar_dot": [i, u64p, u64p, u64p, z],
        "pasta_batch_inv": [i, u64p, u64p, z],
        "pasta_ntt": [i, u64p, z, u64p, i],
        "pasta_ec_fold": [i, u64p, u64p, u8p, u64p, u64p, u8p, u64p, u64p, u64p, u8p, z],
        "pasta_ec_batch_mul": [i, u64p, u64p, u64p, u8p, u64p, u64p, u8p, z],
        "pasta_msm": [i, u64p, u64p, u64p, u8p, z, u64p, u64p, u8p],
        "pasta_poseidon_set_constants": [i, u64p, u64p],
        "pasta_poseidon_permute": [i, u64p, z],
    }
    for name, argtypes in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = None
    lib.pasta_poseidon_ready.argtypes = [i]
    lib.pasta_poseidon_ready.restype = ctypes.c_int
    lib.pasta_native_abi_version.restype = ctypes.c_int
    return lib


def _get() -> ctypes.CDLL | None:
    global _lib
    if _lib is None and _lib_err is None:
        with _lock:
            if _lib is None and _lib_err is None:
                _lib = _build()
    return _lib


def available() -> bool:
    return _get() is not None


# ---------------- fastlimbs CPython extension ---------------- #

_FL_SRC = _HERE / "fastlimbs.c"
_fastlimbs = None
_fastlimbs_err: str | None = None


def _build_fastlimbs():
    global _fastlimbs_err
    if os.environ.get("HALO_TPU_NO_NATIVE"):
        _fastlimbs_err = "disabled via HALO_TPU_NO_NATIVE"
        return None
    import sysconfig

    src = _FL_SRC.read_bytes()
    tag = hashlib.sha256(src + sysconfig.get_python_version().encode()).hexdigest()[:16]
    so = _CACHE / f"fastlimbs-{tag}.so"
    if not so.exists():
        _CACHE.mkdir(parents=True, exist_ok=True)
        tmp = so.with_suffix(f".so.{os.getpid()}.tmp")
        cmd = [
            "gcc", "-O2", "-shared", "-fPIC",
            "-I", sysconfig.get_paths()["include"],
            "-o", str(tmp), str(_FL_SRC),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
            _fastlimbs_err = f"fastlimbs build failed: {getattr(e, 'stderr', b'') or e}"
            return None
        os.replace(tmp, so)
    try:
        import importlib.util
        from importlib.machinery import ExtensionFileLoader

        loader = ExtensionFileLoader("fastlimbs", str(so))
        spec = importlib.util.spec_from_loader("fastlimbs", loader)
        mod = importlib.util.module_from_spec(spec)
        loader.exec_module(mod)
        return mod
    except Exception as e:  # pragma: no cover - load failure -> fallback
        _fastlimbs_err = f"fastlimbs load failed: {e}"
        return None


def fastlimbs():
    """The bulk int<->limb converter module, or None (callers fall back)."""
    global _fastlimbs
    if _fastlimbs is None and _fastlimbs_err is None:
        with _lock:
            if _fastlimbs is None and _fastlimbs_err is None:
                _fastlimbs = _build_fastlimbs()
    return _fastlimbs


# ---------------- marshalling ---------------- #


def ints_to_u64(xs: list[int]) -> np.ndarray:
    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    return np.frombuffer(buf, dtype="<u8").reshape(len(xs), 4).copy()


def u64_to_ints(a: np.ndarray) -> list[int]:
    raw = np.ascontiguousarray(a, dtype="<u8").tobytes()
    return [int.from_bytes(raw[32 * i : 32 * i + 32], "little") for i in range(len(a))]


def pts_to_arrays(pts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = len(pts)
    xs = [0] * n
    ys = [0] * n
    infs = np.zeros(n, dtype=np.uint8)
    for i, p in enumerate(pts):
        if p is None:
            infs[i] = 1
        else:
            xs[i], ys[i] = p
    return ints_to_u64(xs), ints_to_u64(ys), infs


def arrays_to_pts(xs: np.ndarray, ys: np.ndarray, infs: np.ndarray):
    xi, yi = u64_to_ints(xs), u64_to_ints(ys)
    return [None if infs[i] else (xi[i], yi[i]) for i in range(len(infs))]


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _p8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _fid(m: int) -> int:
    from ..fields import FP_MOD

    return FP if m == FP_MOD else FQ


def _cid(cfg) -> int:
    return PALLAS_ID if cfg.name == "pallas" else VESTA_ID


# ---------------- public wrappers (int-list boundary) ---------------- #


def batch_mul(m: int, a: list[int], b: list[int]) -> list[int]:
    lib = _get()
    aa, bb = ints_to_u64(a), ints_to_u64(b)
    out = np.empty_like(aa)
    lib.pasta_batch_mul(_fid(m), _p64(aa), _p64(bb), _p64(out), len(a))
    return u64_to_ints(out)


def batch_add(m: int, a: list[int], b: list[int]) -> list[int]:
    lib = _get()
    aa, bb = ints_to_u64(a), ints_to_u64(b)
    out = np.empty_like(aa)
    lib.pasta_batch_add(_fid(m), _p64(aa), _p64(bb), _p64(out), len(a))
    return u64_to_ints(out)


def batch_sub(m: int, a: list[int], b: list[int]) -> list[int]:
    lib = _get()
    aa, bb = ints_to_u64(a), ints_to_u64(b)
    out = np.empty_like(aa)
    lib.pasta_batch_sub(_fid(m), _p64(aa), _p64(bb), _p64(out), len(a))
    return u64_to_ints(out)


def batch_axpy(m: int, a: list[int], b: list[int], s: int) -> list[int]:
    """out = a + s*b elementwise."""
    lib = _get()
    aa, bb, ss = ints_to_u64(a), ints_to_u64(b), ints_to_u64([s])
    out = np.empty_like(aa)
    lib.pasta_batch_axpy(_fid(m), _p64(aa), _p64(bb), _p64(ss), _p64(out), len(a))
    return u64_to_ints(out)


def scalar_dot(m: int, a: list[int], b: list[int]) -> int:
    lib = _get()
    aa, bb = ints_to_u64(a), ints_to_u64(b)
    out = np.zeros((1, 4), dtype="<u8")
    lib.pasta_scalar_dot(_fid(m), _p64(aa), _p64(bb), _p64(out), len(a))
    return u64_to_ints(out)[0]


def batch_inv(m: int, a: list[int]) -> list[int]:
    lib = _get()
    aa = ints_to_u64(a)
    out = np.empty_like(aa)
    lib.pasta_batch_inv(_fid(m), _p64(aa), _p64(out), len(a))
    return u64_to_ints(out)


def ntt(m: int, vec: list[int], root: int, inverse: bool = False) -> list[int]:
    lib = _get()
    a = ints_to_u64(vec)
    rr = ints_to_u64([root])
    lib.pasta_ntt(_fid(m), _p64(a), len(vec), _p64(rr), 1 if inverse else 0)
    return u64_to_ints(a)


def ec_fold(cfg, ps, qs, s: int):
    """[P_i + s*Q_i] — the IPA G-fold (reference pcdl.rs:428)."""
    lib = _get()
    px, py, pinf = pts_to_arrays(ps)
    qx, qy, qinf = pts_to_arrays(qs)
    ss = ints_to_u64([s % cfg.r])
    n = len(ps)
    ox, oy = np.empty_like(px), np.empty_like(py)
    oinf = np.zeros(n, dtype=np.uint8)
    lib.pasta_ec_fold(
        _cid(cfg), _p64(px), _p64(py), _p8(pinf), _p64(qx), _p64(qy), _p8(qinf),
        _p64(ss), _p64(ox), _p64(oy), _p8(oinf), n,
    )
    return arrays_to_pts(ox, oy, oinf)


def ec_batch_mul(cfg, ks: list[int], pts):
    lib = _get()
    xs, ys, infs = pts_to_arrays(pts)
    kk = ints_to_u64([k % cfg.r for k in ks])
    n = len(pts)
    ox, oy = np.empty_like(xs), np.empty_like(ys)
    oinf = np.zeros(n, dtype=np.uint8)
    lib.pasta_ec_batch_mul(
        _cid(cfg), _p64(kk), _p64(xs), _p64(ys), _p8(infs), _p64(ox), _p64(oy), _p8(oinf), n
    )
    return arrays_to_pts(ox, oy, oinf)


def msm(cfg, scalars: list[int], pts):
    lib = _get()
    xs, ys, infs = pts_to_arrays(pts)
    kk = ints_to_u64([k % cfg.r for k in scalars])
    ox = np.zeros((1, 4), dtype="<u8")
    oy = np.zeros((1, 4), dtype="<u8")
    oinf = np.zeros(1, dtype=np.uint8)
    lib.pasta_msm(
        _cid(cfg), _p64(kk), _p64(xs), _p64(ys), _p8(infs), len(scalars),
        _p64(ox), _p64(oy), _p8(oinf),
    )
    return None if oinf[0] else (u64_to_ints(ox)[0], u64_to_ints(oy)[0])


_pos_init = [False, False]


def _ensure_poseidon(m: int) -> None:
    fid = _fid(m)
    if _pos_init[fid]:
        return
    lib = _get()
    from ..fields import FP_MOD
    from ..poseidon import constants as pc

    mds_t = pc.FP_MDS if m == FP_MOD else pc.FQ_MDS
    rc_t = pc.FP_ROUND_CONSTANTS if m == FP_MOD else pc.FQ_ROUND_CONSTANTS
    mds = ints_to_u64([v for row in mds_t for v in row])
    rc = ints_to_u64([v for row in rc_t for v in row])
    lib.pasta_poseidon_set_constants(fid, _p64(mds), _p64(rc))
    _pos_init[fid] = True


def poseidon_permute(m: int, state: list[int]) -> list[int]:
    """One 55-round permutation of a 3-element state."""
    lib = _get()
    _ensure_poseidon(m)
    st = ints_to_u64(state)
    lib.pasta_poseidon_permute(_fid(m), _p64(st), 1)
    return u64_to_ints(st)


def poseidon_permute_batch(m: int, states: list[list[int]]) -> list[list[int]]:
    lib = _get()
    _ensure_poseidon(m)
    flat = ints_to_u64([v for st in states for v in st])
    lib.pasta_poseidon_permute(_fid(m), _p64(flat), len(states))
    outs = u64_to_ints(flat)
    return [outs[3 * i : 3 * i + 3] for i in range(len(states))]

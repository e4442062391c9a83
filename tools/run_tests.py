"""Per-file test runner: each test file in its own pytest process.

Why not plain `pytest -n 2`: XLA's CPU backend has an in-process defect
where, after a few dozen large limb-arithmetic executables accumulate,
the next backend_compile segfaults (deterministic around the same test;
see pytest.ini).  xdist's --dist loadfile spreads files across two
long-lived workers, so one worker still accumulates half the suite and
crashes.  Running one process per FILE caps accumulation at file scope --
every file passes in isolation -- at the cost of re-importing jax per file
(~2 s warm).  The persistent compilation cache (tests/conftest.py) makes
repeat runs compile-free.

Usage:
    python tools/run_tests.py              # default suite (-m "not slow")
    python tools/run_tests.py -m slow     # slow suite
    python tools/run_tests.py tests/test_msm.py ...   # subset
Exit code: 0 iff every file passed.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main() -> int:
    args = sys.argv[1:]
    # default to the fast suite; `-o addopts=` below wipes pytest.ini's
    # marker filter, so it must be restated here (round-3 advisor finding)
    marks = ["-m", "not slow"]
    files = []
    it = iter(args)
    for a in it:
        if a == "-m":
            marks = ["-m", next(it)]
        else:
            files.append(a)
    if not files:
        files = sorted(str(p.relative_to(ROOT)) for p in (ROOT / "tests").glob("test_*.py"))
    jobs = int(os.environ.get("HALO_TPU_TEST_JOBS", "2"))

    results = {}

    def run(f):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "pytest", f, "-q", "-o", "addopts=", *marks],
            cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        dt = time.time() - t0
        results[f] = (p.returncode, dt, p.stdout)
        tail = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        # rc 5 = no tests collected (e.g. everything filtered by -m)
        status = "ok" if p.returncode in (0, 5) else f"FAIL rc={p.returncode}"
        print(f"[{dt:7.1f}s] {status:12} {f}  {tail}", flush=True)

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=jobs) as ex:
        list(ex.map(run, files))
    bad = {f: r for f, r in results.items() if r[0] not in (0, 5)}
    print(f"\ntotal {time.time() - t0:.1f}s; {len(files) - len(bad)}/{len(files)} files ok")
    for f, (rc, dt, out) in sorted(bad.items()):
        print(f"\n==== {f} (rc={rc}) ====\n{out[-2500:]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

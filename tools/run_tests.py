"""Run the test suite to completion, in a few pytest subprocesses.

Why this exists (round-4 VERDICT #2): one single-process `pytest tests/`
run accumulates XLA:CPU compile state across ~90 jitted test modules and
segfaults reproducibly inside `backend_compile_and_load` at ~88% — a
jaxlib arena bug, not a bad test (every module passes alone). Splitting
the run into a handful of subprocesses bounds per-process compile state,
so ONE command now executes EVERY test:

    python tools/run_tests.py            # fast suite (the default subset)
    python tools/run_tests.py --slow     # the slow image-level e2e modules
    python tools/run_tests.py --all      # both

Groups run in parallel subprocesses (default: 2, matching this host's
cores). Heavy e2e modules get their own process; small unit modules are
batched. Exit code is nonzero if ANY group fails, and the per-group
tails are printed for failed groups.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Modules that must run in their own process: they compile the big fused
# e2e programs (the cumulative-state trigger) or take minutes on their own.
HEAVY = [
    "test_vi_e2e.py",      # segfault trigger when run after ~80 tests
    "test_mono_e2e.py",
    "test_dist_ba.py",
    "test_multihost.py",   # spawns jax.distributed subprocesses itself
]

SLOW = [  # pytest.mark.slow image-level e2e modules (minutes each)
    "test_image_e2e.py",
    "test_vi_image_e2e.py",
    "test_calibration_e2e.py",
    "test_loop_image_e2e.py",
    "test_hostile_sequences.py",
]


def discover_fast_groups() -> list[list[str]]:
    mods = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    rest = [m for m in mods if m not in HEAVY and m not in SLOW]
    # batch the small modules into two halves (alphabetical split keeps the
    # grouping stable across runs; each half stays well under the ~80-test
    # compile-state budget where the jaxlib crash appears)
    half = (len(rest) + 1) // 2
    groups = [[m] for m in HEAVY if os.path.exists(os.path.join(REPO, "tests", m))]
    groups.append(rest[:half])
    groups.append(rest[half:])
    return [g for g in groups if g]


def run_group(mods: list[str], marker: str | None, extra: list[str]) -> dict:
    cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]
    if marker is not None:
        cmd += ["-m", marker]
    cmd += [os.path.join("tests", m) for m in mods] + extra
    t0 = time.perf_counter()
    p = subprocess.run(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
    )
    return {
        "mods": mods,
        "rc": p.returncode,
        "s": time.perf_counter() - t0,
        "tail": "\n".join(p.stdout.splitlines()[-25:]),
        "last": p.stdout.splitlines()[-1] if p.stdout.splitlines() else "",
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slow", action="store_true", help="run only the slow e2e modules")
    ap.add_argument("--all", action="store_true", help="run fast + slow")
    ap.add_argument("--jobs", type=int, default=min(2, os.cpu_count() or 1))
    args, extra = ap.parse_known_args()

    jobs: list[tuple[list[str], str | None]] = []
    if not args.slow or args.all:
        for g in discover_fast_groups():
            jobs.append((g, None))  # pyproject addopts already excludes slow
    if args.slow or args.all:
        for m in SLOW:
            jobs.append(([m], "slow"))

    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    results = []
    with ThreadPoolExecutor(max_workers=max(1, args.jobs)) as ex:
        futs = [ex.submit(run_group, mods, marker, extra) for mods, marker in jobs]
        for f in futs:
            r = f.result()
            status = "ok" if r["rc"] in (0, 5) else f"FAIL rc={r['rc']}"
            names = ",".join(r["mods"]) if len(r["mods"]) <= 3 else (
                f"{r['mods'][0]},...x{len(r['mods'])}")
            print(f"[{r['s']:7.1f}s] {status:12s} {names}: {r['last']}", flush=True)
            results.append(r)

    failed = [r for r in results if r["rc"] not in (0, 5)]  # 5 = no tests collected
    print(f"\ntotal {time.perf_counter() - t0:.1f}s, "
          f"{len(results) - len(failed)}/{len(results)} groups green")
    for r in failed:
        print(f"\n--- FAILED: {' '.join(r['mods'])} ---\n{r['tail']}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

"""One-off: sharded full-suite run that also records per-test durations
(junitxml per shard) so the r11 fast/slow tiering can be data-driven.
Same partitioning heuristic as shard_tests.py.  Dev-facing and
collect-gate-exempt: it runs pytest subprocesses and parses their
summaries; it is never part of a registered query plan."""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
TESTS = REPO / "tests"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    files = sorted(
        TESTS.glob("test_*.py"), key=lambda p: p.stat().st_size, reverse=True
    )
    shards: list[list[pathlib.Path]] = [[] for _ in range(n)]
    sizes = [0] * n
    for f in files:
        i = sizes.index(min(sizes))
        shards[i].append(f)
        sizes[i] += f.stat().st_size
    procs = []
    t0 = time.time()
    for i, shard in enumerate(shards):
        if not shard:
            continue
        log = open(f"/tmp/tshard_{i}.log", "w")
        procs.append(
            (
                i,
                subprocess.Popen(
                    [
                        sys.executable, "-m", "pytest", "-q",
                        "-p", "no:cacheprovider",
                        f"--junitxml=/tmp/tshard_{i}.xml",
                        "-o", "addopts=",
                    ]
                    + [str(f) for f in shard],
                    cwd=REPO,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                ),
            )
        )
    rc = 0
    for i, p in procs:
        r = p.wait()
        if r != 0:
            rc = 1
        print(f"shard {i}: rc={r}")
    print(f"total wall {time.time() - t0:.0f}s rc={rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

"""One-stop verification: pytest + full DuckDB oracle gate + bench +
plan audit. Exit 0 iff everything is green.

Usage: python tools/verify_all.py [--quick] [--scale]
  --quick: skip bench and plan report (tests + oracle only)
  --scale: also run the 16x scale-bound suite (SPARK_GRAFT_SCALE=1
           tests) and record the result in SCALECHECK.json — VERDICT
           r5 #5: the scale suite runs once per round, committed next
           to CORRECTNESS_HEAD.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

STEPS = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"]),
    ("oracle", [sys.executable, "tools/check_oracle.py"]),
    ("bench", [sys.executable, "bench.py"]),
    ("plans", [sys.executable, "tools/plan_report.py"]),
]

def run_scale() -> int:
    """Run the env-gated 16x scale suite and write SCALECHECK.json."""
    cmd = [sys.executable, "-m", "pytest", "tests/test_scale.py", "-q"]
    env = dict(os.environ, SPARK_GRAFT_SCALE="1")
    t0 = time.time()
    proc = subprocess.run(cmd, cwd="/root/repo", env=env,
                          capture_output=True, text=True)
    tail = (proc.stdout or "").strip().splitlines()[-3:]
    rec = {
        "suite": "tests/test_scale.py",
        "env": {"SPARK_GRAFT_SCALE": "1"},
        "rc": proc.returncode,
        "seconds": round(time.time() - t0, 1),
        "tail": tail,
        "head": _git_head(),
        "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open("/root/repo/SCALECHECK.json", "w") as f:
        json.dump(rec, f, indent=1)
    print("\n".join(tail))
    return proc.returncode


def _git_head() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd="/root/repo",
            capture_output=True, text=True).stdout.strip()
    except OSError:
        return ""


def main() -> int:
    quick = "--quick" in sys.argv
    scale = "--scale" in sys.argv
    failed = []
    for name, cmd in STEPS:
        if quick and name in ("bench", "plans"):
            continue
        print(f"=== {name}: {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd, cwd="/root/repo")
        print(f"=== {name}: {'OK' if rc == 0 else f'FAILED rc={rc}'}", flush=True)
        if rc:
            failed.append(name)
    if scale:
        print("=== scale: SPARK_GRAFT_SCALE=1 pytest tests/test_scale.py",
              flush=True)
        rc = run_scale()
        print(f"=== scale: {'OK' if rc == 0 else f'FAILED rc={rc}'}",
              flush=True)
        if rc:
            failed.append("scale")
    print("ALL GREEN" if not failed else f"FAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

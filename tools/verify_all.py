"""One-stop verification: pytest + full DuckDB oracle gate + bench +
plan audit. Exit 0 iff everything is green.

Usage: python tools/verify_all.py [--quick]
  --quick: skip bench and plan report (tests + oracle only)
"""

from __future__ import annotations

import subprocess
import sys

STEPS = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"]),
    ("oracle", [sys.executable, "tools/check_oracle.py"]),
    ("bench", [sys.executable, "bench.py"]),
    ("plans", [sys.executable, "tools/plan_report.py"]),
]


def main() -> int:
    quick = "--quick" in sys.argv
    failed = []
    for name, cmd in STEPS:
        if quick and name in ("bench", "plans"):
            continue
        print(f"=== {name}: {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd, cwd="/root/repo")
        print(f"=== {name}: {'OK' if rc == 0 else f'FAILED rc={rc}'}", flush=True)
        if rc:
            failed.append(name)
    print("ALL GREEN" if not failed else f"FAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

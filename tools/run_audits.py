"""One-shot audit battery: every result-stability axis the repo maintains,
in sequence, with a final summary table.

Axes (each its own subprocess so a crash in one can't mask another):
  1. pandas parity at sf0.001 and sf0.01 (driver-exact compare, non-UTC TZ)
  2. input-layout perturbation parity (SPARK_GRAFT_INPUT_PARTITIONS=7)
  3. determinism under shuffle-plan perturbation
  4. empty-input robustness
  5. NULL-injection parity (builds the twin dataset first)
  6. plan-shape audit (explain_check)

Usage: python tools/run_audits.py [--quick]
  --quick limits axes 2-5 to the gate head (first 50 registry queries)
  instead of the full registry. Exit code = number of failing axes.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main() -> int:
    quick = "--quick" in sys.argv
    head: list[str] = []
    if quick:
        out = subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys; sys.path.insert(0, %r); import __spark_entry__ as e; "
                "print('\\n'.join(list(e.queries())[:50]))" % REPO,
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        if out.returncode != 0 or not out.stdout.strip():
            print("FATAL: could not list the registry head for --quick "
                  "(registry import failed); refusing to silently run the "
                  "full battery.", file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            return 1
        head = out.stdout.split()

    py = sys.executable
    t0 = time.time()
    axes: list[tuple[str, list[str], dict[str, str]]] = [
        (
            "parity_sf0.001",
            [py, "tools/pandas_parity_check.py", "/root/testdata/sf0.001"],
            {"SPARK_GRAFT_PARITY_TZ": "America/New_York"},
        ),
        (
            "parity_sf0.01",
            [py, "tools/pandas_parity_check.py", "/root/testdata/sf0.01"],
            {"SPARK_GRAFT_PARITY_TZ": "America/New_York"},
        ),
        (
            "layout_perturbation",
            [py, "tools/pandas_parity_check.py", "/root/testdata/sf0.01", *head],
            {"SPARK_GRAFT_INPUT_PARTITIONS": "7"},
        ),
        (
            "determinism",
            [py, "tools/determinism_check.py", "/root/testdata/sf0.01", *head],
            {},
        ),
        ("empty_input", [py, "tools/empty_input_check.py", *head], {}),
        ("null_build", [py, "tools/make_null_dataset.py"], {}),
        (
            "null_parity",
            [py, "tools/pandas_parity_check.py", "/tmp/spark-graft-nulls", *head],
            {},
        ),
        ("plan_shapes", [py, "tools/explain_check.py"], {}),
    ]

    results: list[tuple[str, int, float]] = []
    for name, cmd, extra_env in axes:
        env = dict(os.environ, **extra_env)
        start = time.time()
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True)
        took = time.time() - start
        results.append((name, proc.returncode, took))
        status = "PASS" if proc.returncode == 0 else "FAIL"
        print(f"[{status}] {name} ({took:.0f}s)")
        if proc.returncode != 0:
            print("\n".join(proc.stdout.splitlines()[-15:]))
            # tracebacks and Spark launch errors land on stderr
            print("\n".join(proc.stderr.splitlines()[-15:]), file=sys.stderr)

    failures = [n for n, rc, _ in results if rc != 0]
    print(f"\n{'=' * 60}")
    for name, rc, took in results:
        print(f"{'PASS' if rc == 0 else 'FAIL':4s}  {name:22s} {took:7.0f}s")
    print(f"total {time.time() - t0:.0f}s; {len(failures)} failing axes: {failures}")
    return len(failures)


if __name__ == "__main__":
    raise SystemExit(main())

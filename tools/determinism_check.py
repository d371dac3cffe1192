"""Determinism audit: every registered query must produce IDENTICAL results
when the physical plan is perturbed (different shuffle partition counts →
different partition boundaries, accumulation orders, AQE decisions).

An engine claiming reproducible corpus builds cannot emit results that
depend on parallelism: order-dependent double sums, partition-sensitive
sampling, or rank ties broken by partition id all surface here as run-to-run
diffs. Complements the oracle compare (which pins one plan against DuckDB).

Usage: python tools/determinism_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storm_data_etl_spark.session import get_spark, release_pinned


def _snapshot(df) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("determinism-check", master="local[8]")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = _snapshot(fn(spark, sf_dir))
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = _snapshot(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[ERROR ] {name}: {e}")
            failures.append(name)
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            release_pinned()
        if len(a) != len(b):
            print(f"[NONDET] {name}: {len(a)} rows vs {len(b)} rows")
            failures.append(name)
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:2]
            print(f"[NONDET] {name}: value diffs {diffs}")
            failures.append(name)
        else:
            print(f"[STABLE] {name}: {len(a)} rows")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL STABLE")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

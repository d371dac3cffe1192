"""Empty-input robustness audit: every registered query must execute
without raising against a dataset where every table has ZERO rows (schema
preserved). An engine meets empty partitions, empty date ranges, and
freshly-created tables constantly — "crashes on empty input" is the classic
first-day-in-production bug class (driver-side .collect()[0], percentile of
nothing, min() of an empty frame fed into a literal).

Row counts are not asserted (an empty corpus legitimately yields empty or
zero-row summaries) — only absence of exceptions.

Usage: python tools/empty_input_check.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storm_data_etl_spark.plans.tables import TABLES
from storm_data_etl_spark.session import get_spark, release_pinned


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("empty-input-check", master="local[4]")

    src = "/root/testdata/sf0.001"
    # Fixed path, recreated per run: a mkdtemp per invocation would
    # accumulate datasets (and, via the bucketed-join query's
    # directory-keyed tables, warehouse junk) forever.
    empty_dir = "/tmp/spark-graft-empty"
    shutil.rmtree(empty_dir, ignore_errors=True)
    for tname in TABLES:
        df = spark.read.parquet(f"{src}/{tname}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            f"{empty_dir}/{tname}.parquet"
        )

    import __spark_entry__ as entrymod

    failures = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            rows = fn(spark, empty_dir).collect()
            print(f"[OK    ] {name}: {len(rows)} rows")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"[CRASH ] {name}: {msg}")
            failures.append(name)
        finally:
            release_pinned()

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

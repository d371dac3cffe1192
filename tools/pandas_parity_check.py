"""Pandas-level replica of the driver's correctness gate.

The driver converts both result sets to pandas (Spark .toPandas(), DuckDB
.df()), sorts columns by name, sorts rows, and hash-compares VALUES —
so dtype artifacts matter: DuckDB sum(BIGINT) returns HUGEINT which lands
in pandas as float64, while Spark sum(long) lands as int64; 60000.0 hashes
differently from 60000 even though repr-compare passes. This tool surfaces
exactly that class of mismatch.

Usage: python tools/pandas_parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from storm_data_etl_spark.plans.tables import TABLES
from storm_data_etl_spark.session import get_spark, release_pinned


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("pandas-parity", master="local[8]")
    # SPARK_GRAFT_PARITY_TZ: simulate a host session with a non-UTC
    # timezone (the driver builds its own session; queries must self-pin).
    # Re-forced before EVERY query — t() and the enrich runners reset UTC,
    # so a single upfront set would only test the first query.
    tz = os.environ.get("SPARK_GRAFT_PARITY_TZ")
    if tz:
        print(f"[session timezone forced to {tz} before each query]")
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tname}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if tz:
            spark.conf.set("spark.sql.session.timeZone", tz)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[SPARK ERROR] {name}: {e}")
            failures.append(name)
            continue
        finally:
            release_pinned()
        if name not in oracles:
            # Driver still canonicalizes rows-only results: sort must not
            # blow up on unhashable cells (lists/arrays/dicts).
            try:
                _canon(sdf)
                print(f"[ROWS-ONLY ] {name}: {len(sdf)} rows (sortable)")
            except Exception as e:  # noqa: BLE001
                print(f"[UNSORTABLE ] {name}: {e}")
                failures.append(name)
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[DUCK ERROR ] {name}: {e}")
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(
                f"[SCHEMA MISM] {name}: spark={sorted(sdf.columns)} "
                f"duck={sorted(ddf.columns)}"
            )
            failures.append(name)
            continue
        try:
            sc, dc = _canon(sdf), _canon(ddf)
        except Exception as e:  # noqa: BLE001
            print(f"[UNSORTABLE ] {name}: {e}")
            failures.append(name)
            continue
        if len(sc) != len(dc):
            print(f"[COUNT MISM ] {name}: spark={len(sc)} duck={len(dc)}")
            failures.append(name)
            continue
        # Driver-equivalent compare: stringified cell values after pandas
        # conversion. This reproduces the observed driver verdicts: int32 vs
        # int64 pass (str identical), DuckDB HUGEINT-sum float64 vs Spark
        # int64 fail ('60000.0' != '60000'), Timestamp vs datetime.date fail.
        bad_cols = []
        for c in sc.columns:
            a, b = sc[c].tolist(), dc[c].tolist()
            diffs = [
                (x, y, type(x).__name__, type(y).__name__)
                for x, y in zip(a, b)
                if str(x) != str(y)
            ][:2]
            if diffs:
                bad_cols.append(f"{c}: values {diffs}")
        if bad_cols:
            print(f"[MISMATCH   ] {name}: {'; '.join(bad_cols)}")
            failures.append(name)
        else:
            print(f"[MATCH      ] {name}: {len(sc)} rows")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

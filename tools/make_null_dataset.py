"""Build a null-injected twin of a testdata directory for the NULL-parity
audit: deterministic fractions of the nullable payload columns (events
event_type/value/props, documents lang/text, embeddings embedding) become
NULL; keys and join columns stay intact.

Run the driver-equivalent compare against it afterwards:

    python tools/make_null_dataset.py            # → /tmp/spark-graft-nulls
    python tools/pandas_parity_check.py /tmp/spark-graft-nulls

This audit found (round 2) and now guards against: xxhash64(NULL) returning
the seed (pairing every null doc in the dedup family), Spark collect_list
skipping NULLs where DuckDB list() keeps them, Spark concat nulling out
where DuckDB concat() skips, NULLS FIRST/LAST ordering defaults, and numpy
kernels receiving None.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark-graft-nulls"


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    passthrough = ["region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem"]
    for t in passthrough:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"""COPY (
      SELECT event_id, ts, user_id,
             CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END AS event_type,
             CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value,
             CASE WHEN event_id % 17 = 0 THEN NULL ELSE props END AS props
      FROM read_parquet('{SRC}/events.parquet'))
      TO '{OUT}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
             source,
             CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS text,
             n_chars
      FROM read_parquet('{SRC}/documents.parquet'))
      TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
      SELECT vec_id,
             CASE WHEN vec_id % 19 = 0 THEN NULL ELSE embedding END AS embedding,
             label
      FROM read_parquet('{SRC}/embeddings.parquet'))
      TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")
    print(f"null-injected twin of {SRC} written to {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

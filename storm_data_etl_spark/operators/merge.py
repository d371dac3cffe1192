"""CDC / changelog merge: upsert a stream of keyed changes into a snapshot.

The reference's idempotent-replay design pushes dedup to a downstream
``ON CONFLICT (id) DO NOTHING`` (docs/Architecture.md:98-102 — first-wins,
implemented here as operators.relational.first_wins_dedup).  A training-data
lake needs the complementary primitive: **last-writer-wins** merge of a
change log (inserts / updates / deletes) into the current snapshot — the
core of incremental ingestion (Delta/Iceberg MERGE INTO, Kafka compacted
topics, Debezium CDC streams).

Scale shape: ONE shuffle on the merge key (window partition).  The change
log is normally ≪ the snapshot; with a lake layout bucketed on the key the
snapshot side needs no exchange at all (see sources.parquet.write_bucketed).
Keys are ids (uniform), so no skew; per-key window state is O(versions per
key), not O(table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_last_writer_wins(
    changelog: DataFrame,
    keys: Sequence[str],
    order_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a changelog (snapshot rows + later changes, distinguished by
    ``order_col``) to the latest surviving row per key.

    - keep the row with the highest ``order_col`` per ``keys`` group
      (ties broken by ``op_col`` descending so an update beats the
      same-version insert deterministically);
    - if ``op_col`` is given, rows whose final state is ``delete_op`` are
      dropped (tombstone semantics).
    """
    order = [F.col(order_col).desc()]
    if op_col:
        order.append(F.col(op_col).desc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    latest = (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if op_col:
        latest = latest.filter(F.col(op_col) != delete_op).drop(op_col)
    return latest

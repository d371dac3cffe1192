"""Tests for the as-of join operator, streaming windowed aggregations, and
the partitioned parquet sink."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from storm_data_etl_spark.operators.asof import as_of_join
from storm_data_etl_spark.streaming.windows import (
    session_window_counts,
    windowed_event_counts,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_as_of_join_semantics(spark):
    quotes = spark.createDataFrame(
        [("A", _ts(9), 100.0), ("A", _ts(11), 110.0), ("B", _ts(10), 50.0)],
        "sym string, qts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts(8), 1),   # before any quote → NULL
            ("A", _ts(9), 2),   # simultaneous → 100 (<= semantics)
            ("A", _ts(10), 3),  # between quotes → 100
            ("A", _ts(12), 4),  # after both → 110
            ("B", _ts(23), 5),  # latest B quote → 50
            ("C", _ts(10), 6),  # key with no quotes → NULL
        ],
        "sym string, tts timestamp, trade_id int",
    )
    out = as_of_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", right_payload=["price"]
    )
    got = {r.trade_id: r.asof_price for r in out.collect()}
    assert got == {1: None, 2: 100.0, 3: 100.0, 4: 110.0, 5: 50.0, 6: None}


def test_windowed_event_counts_batch_parity(spark):
    rows = [
        (1, _ts(9, 5), "click", 1.0),
        (1, _ts(9, 50), "click", 2.0),
        (2, _ts(10, 10), "view", 3.0),
        (2, _ts(11, 59), "click", 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_utc timestamp, event_type string, value double")
    out = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in windowed_event_counts(df).collect()
    }
    assert out[(_ts(9), "click")] == (2, 3.0)
    assert out[(_ts(10), "view")] == (1, 3.0)
    assert out[(_ts(11), "click")] == (1, 4.0)


def test_windowed_event_counts_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    import json

    with open(os.path.join(src, "a.json"), "w") as f:
        for i, (h, m, et, v) in enumerate(
            [(9, 5, "click", 1.0), (9, 50, "click", 2.0), (10, 10, "view", 3.0)]
        ):
            f.write(
                json.dumps(
                    {
                        "user_id": i,
                        "ts_utc": f"2024-01-01T{h:02d}:{m:02d}:00.000Z",
                        "event_type": et,
                        "value": v,
                    }
                )
                + "\n"
            )
    stream = spark.readStream.schema(
        "user_id int, ts_utc timestamp, event_type string, value double"
    ).json(src)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from win_counts").collect()
    finally:
        q.stop()
    got = {(r.window_start, r.event_type): r.n for r in rows}
    assert got[(_ts(9), "click")] == 2
    assert got[(_ts(10), "view")] == 1


def test_session_window_counts(spark):
    rows = [
        (1, _ts(9, 0)), (1, _ts(9, 10)),            # one session
        (1, _ts(11, 0)),                             # second session (gap > 30m)
        (2, _ts(9, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_utc timestamp").withColumn(
        "value", F.lit(1.0)
    )
    out = session_window_counts(df)
    per_user = {}
    for r in out.collect():
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_partitioned_sink_prunes(spark, tmp_path):
    from storm_data_etl_spark.functions.enrich import enrich_raw
    from storm_data_etl_spark.plans.enrich_queries import BASE_TS, golden_df
    from storm_data_etl_spark.sources.parquet import (
        read_events_partitioned,
        write_events_partitioned,
    )

    enriched = enrich_raw(
        golden_df(spark).withColumn("_base_ts", F.lit(BASE_TS).cast("timestamp")),
        processed_at="2024-04-27 06:00:00",
    )
    path = str(tmp_path / "lake")
    write_events_partitioned(enriched, path)
    back = read_events_partitioned(spark, path)
    assert back.count() == enriched.count()

    pruned = back.filter(
        (F.col("event_type") == "hail") & (F.col("bucket_date") == "2024-04-26")
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filters must appear in the scan, not as a post-filter
    assert "PartitionFilters" in plan or pruned.count() == 8
    assert pruned.count() == 8  # 8 hail rows in the golden fixture


def test_bucketed_range_join_semantics(spark):
    from storm_data_etl_spark.operators.range_join import bucketed_range_join

    intervals = spark.createDataFrame(
        [
            ("w1", _ts(9, 0), _ts(10, 0)),    # [09:00, 10:00)
            ("w2", _ts(9, 30), _ts(12, 0)),   # overlaps w1; spans 5 buckets
            ("w3", _ts(20, 0), _ts(20, 30)),  # no points inside
        ],
        "win string, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, _ts(8, 59)),   # just before w1
            (2, _ts(9, 0)),    # start boundary → inclusive (w1)
            (3, _ts(9, 45)),   # inside w1 AND w2 → two output rows
            (4, _ts(10, 0)),   # end boundary of w1 → exclusive; inside w2
            (5, _ts(11, 59)),  # last bucket of w2
            (6, _ts(12, 0)),   # end boundary of w2 → excluded
        ],
        "pid int, ts timestamp",
    )
    out = bucketed_range_join(
        points, intervals, "ts", "start_ts", "end_ts", bucket_width_s=1800
    )
    got = sorted((r.pid, r.win) for r in out.collect())
    assert got == [(2, "w1"), (3, "w1"), (3, "w2"), (4, "w2"), (5, "w2")]
    # each (point, interval) candidate is produced exactly once
    assert out.count() == len(set(got))


def test_bucketed_range_join_wide_interval_narrow_buckets(spark):
    """An interval spanning many buckets must still yield one row per match."""
    from storm_data_etl_spark.operators.range_join import bucketed_range_join

    intervals = spark.createDataFrame(
        [("day", _ts(0, 0), dt.datetime(2024, 1, 2, 0, 0))],
        "win string, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [(h, _ts(h, 30)) for h in range(24)], "pid int, ts timestamp"
    )
    out = bucketed_range_join(
        points, intervals, "ts", "start_ts", "end_ts", bucket_width_s=60
    )
    assert out.count() == 24


def test_as_of_join_tolerance_semantics(spark):
    """tolerance_seconds bounds the lookback: the latest prior match older
    than the tolerance comes back NULL; a match exactly AT the bound (<=)
    still matches; rows with no prior stay NULL as before."""
    quotes = spark.createDataFrame(
        [("A", _ts(9), 100.0), ("B", _ts(10), 50.0)],
        "sym string, qts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts(8), 1),       # before any quote → NULL
            ("A", _ts(9, 30), 2),   # 30 min old → within 1h
            ("A", _ts(10), 3),      # exactly 3600s old → boundary, matches
            ("A", _ts(11), 4),      # 2h old → outside tolerance → NULL
            ("B", _ts(10), 5),      # simultaneous (age 0) → matches
        ],
        "sym string, tts timestamp, trade_id int",
    )
    out = {
        r["trade_id"]: r["asof_price"]
        for r in as_of_join(
            trades,
            quotes,
            on=["sym"],
            left_ts="tts",
            right_ts="qts",
            right_payload=["price"],
            tolerance_seconds=3600.0,
        ).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 100.0, 4: None, 5: 50.0}


def test_as_of_join_no_tolerance_unchanged(spark):
    """Default (no tolerance) still carries arbitrarily old matches — the
    new parameter must not perturb the base semantics."""
    quotes = spark.createDataFrame(
        [("A", _ts(1), 99.0)], "sym string, qts timestamp, price double"
    )
    trades = spark.createDataFrame(
        [("A", _ts(23), 1)], "sym string, tts timestamp, trade_id int"
    )
    row = as_of_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        right_payload=["price"],
    ).collect()[0]
    assert row["asof_price"] == 99.0


def test_partitioned_sink_orc_roundtrip_and_prune(spark, tmp_path):
    """The lake layout is format-agnostic: the ORC container round-trips
    the same rows and prunes partitions exactly like parquet."""
    import pytest

    from storm_data_etl_spark.functions.enrich import enrich_raw
    from storm_data_etl_spark.plans.enrich_queries import BASE_TS, golden_df
    from storm_data_etl_spark.sources.parquet import (
        read_events_partitioned,
        write_events_partitioned,
    )

    enriched = enrich_raw(
        golden_df(spark).withColumn("_base_ts", F.lit(BASE_TS).cast("timestamp")),
        processed_at="2024-04-27 06:00:00",
    )
    path = str(tmp_path / "lake_orc")
    write_events_partitioned(enriched, path, fmt="orc")
    back = read_events_partitioned(spark, path, fmt="orc")
    assert back.count() == enriched.count()
    pruned = back.filter(
        (F.col("event_type") == "hail") & (F.col("bucket_date") == "2024-04-26")
    )
    assert pruned.count() == 8
    # unknown formats are rejected, not silently written
    with pytest.raises(ValueError):
        write_events_partitioned(enriched, path, fmt="avro")
    with pytest.raises(ValueError):
        read_events_partitioned(spark, path, fmt="csvx")

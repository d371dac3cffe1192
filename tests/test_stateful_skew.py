"""Tests for the stateful streaming dedup and skew-salting utilities."""

from __future__ import annotations

import json
import os

from storm_data_etl_spark.operators.skew import (
    salted_distinct_count,
    salted_top_values,
)
from storm_data_etl_spark.streaming.stateful import streaming_first_wins_dedup


def test_streaming_first_wins_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_batch(fname, rows):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # batch 0: a, b, duplicate a
    write_batch(
        "b0.json",
        [
            {"id": "a", "v": 1},
            {"id": "b", "v": 2},
            {"id": "a", "v": 99},
        ],
    )

    stream = spark.readStream.schema("id string, v long").json(src)
    deduped = streaming_first_wins_dedup(stream, "id")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 1 arrives later: duplicate of a (cross-batch) + new c
        write_batch("b1.json", [{"id": "a", "v": 100}, {"id": "c", "v": 3}])
        q.processAllAvailable()
        rows = {r.id: r.v for r in spark.sql("select * from dedup_out").collect()}
    finally:
        q.stop()

    # first occurrence wins within AND across batches
    assert rows == {"a": 1, "b": 2, "c": 3}


def test_salted_distinct_count(spark):
    rows = [("hot", f"v{i % 7}") for i in range(100)] + [("cold", "x"), ("cold", "y")]
    df = spark.createDataFrame(rows, "k string, v string")
    out = {r.k: r.n_distinct for r in salted_distinct_count(df, "k", "v", salt=8).collect()}
    assert out == {"hot": 7, "cold": 2}


def test_salted_top_values(spark):
    rows = (
        [("k1", "a")] * 5 + [("k1", "b")] * 3 + [("k1", "c")] + [("k2", "z")] * 2
    )
    df = spark.createDataFrame(rows, "k string, v string")
    out = salted_top_values(df, "k", "v", n=2, salt=4).collect()
    got = {(r.key, r.rank): (r.value, r["count"]) for r in out}
    assert got[("k1", 1)] == ("a", 5)
    assert got[("k1", 2)] == ("b", 3)
    assert got[("k2", 1)] == ("z", 2)

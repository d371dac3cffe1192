"""Tests for the stormgen Python DataSource (Spark 4 custom connector)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from storm_data_etl_spark.sources.stormgen import StormGenDataSource


def _register(spark):
    spark.dataSource.register(StormGenDataSource)


def test_stormgen_batch_deterministic(spark):
    _register(spark)
    df = spark.read.format("stormgen").option("numRows", 500).load()
    assert df.count() == 500
    assert [f.name for f in df.schema.fields][:3] == ["Time", "Size", "F_Scale"]
    # pure function of (seed, index): two reads are identical
    a = sorted(map(tuple, df.collect()))
    b = sorted(
        map(
            tuple,
            spark.read.format("stormgen").option("numRows", 500).load().collect(),
        )
    )
    assert a == b
    # different seed differs
    c = (
        spark.read.format("stormgen")
        .option("numRows", 500)
        .option("seed", 7)
        .load()
        .collect()
    )
    assert sorted(map(tuple, c)) != a
    # magnitude column exclusivity mirrors the reference CSVs (S9)
    bad = df.filter(
        ((F.col("EventType") == "hail") & (F.col("Size") == ""))
        | ((F.col("EventType") == "tornado") & (F.col("F_Scale") == ""))
        | ((F.col("EventType") == "wind") & (F.col("Speed") == ""))
    )
    assert bad.count() == 0


def test_stormgen_filter_pushdown(spark):
    _register(spark)
    df = (
        spark.read.format("stormgen")
        .option("numRows", 400)
        .load()
        .filter(F.col("EventType") == "hail")
    )
    rows = df.collect()
    assert rows and all(r.EventType == "hail" for r in rows)
    # matches the unpushed count
    full = spark.read.format("stormgen").option("numRows", 400).load()
    assert len(rows) == full.filter(F.col("EventType") == "hail").count()


def test_stormgen_enrichment_end_to_end(spark):
    """The generated raw records drive the real enrichment dataflow."""
    from storm_data_etl_spark.functions.enrich import enrich_raw

    _register(spark)
    raw = (
        spark.read.format("stormgen")
        .option("numRows", 300)
        .load()
        .withColumn(
            "_base_ts", F.lit("2024-04-26T12:00:00Z").cast("timestamp")
        )
    )
    enriched = enrich_raw(raw)
    assert enriched.count() == 300
    stats = enriched.agg(
        F.sum((F.col("measurement.magnitude") > 0).cast("int")).alias("n_mag"),
        F.sum((F.col("source_office") != "").cast("int")).alias("n_office"),
        F.sum(F.col("location.distance").isNotNull().cast("int")).alias("n_dist"),
    ).first()
    # offices always parse; locations always match 'D DIR Name'; EF0 tornado
    # rows legitimately have magnitude 0
    assert stats.n_office == 300
    assert stats.n_dist == 300
    assert stats.n_mag > 200


def test_stormgen_streaming(spark):
    _register(spark)
    stream = (
        spark.readStream.format("stormgen")
        .option("rowsPerBatch", 50)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("stormgen_out")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select * from stormgen_out").count() >= 100:
                break
            time.sleep(0.5)
        n = spark.sql("select * from stormgen_out").count()
        # the stream replays the same deterministic index sequence the
        # batch reader produces
        got_first = {
            tuple(r)
            for r in spark.sql("select * from stormgen_out").collect()
        }
        batch = {
            tuple(r)
            for r in spark.read.format("stormgen")
            .option("numRows", 50)
            .load()
            .collect()
        }
    finally:
        q.stop()
    assert n >= 100
    assert batch <= got_first

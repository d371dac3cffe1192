"""sources/media.py: binaryFile → MEDIA layout, wholetext corpus ingestion,
ORC round-trip with partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from storm_data_etl_spark.sources import media as M


def test_read_binary_files_media_layout(spark, tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake-bytes")
    (d / "b.jpg").write_bytes(b"\xff\xd8-fake-jpeg")
    (d / "notes.txt").write_bytes(b"not media")

    df = M.read_binary_files(spark, str(d), glob="*.{png,jpg}")
    rows = {os.path.basename(r["source_path"]): r for r in df.collect()}
    assert set(rows) == {"a.png", "b.jpg"}
    assert rows["a.png"]["meta"]["mime"] == "image/png"
    assert rows["b.jpg"]["meta"]["mime"] == "image/jpeg"
    assert bytes(rows["a.png"]["payload"]) == b"\x89PNG-fake-bytes"
    assert rows["a.png"]["n_bytes"] == 15
    # media_id deterministic across re-reads
    df2 = M.read_binary_files(spark, str(d), glob="*.{png,jpg}")
    assert {r["media_id"] for r in df2.collect()} == {
        r["media_id"] for r in rows.values()
    }
    # feeds the multimodal operators' expected columns
    from storm_data_etl_spark.operators.multimodal import media_stats

    stats = media_stats(df.select("media_id", "payload", "meta"))
    assert stats.count() == 2


def test_read_text_corpus_one_doc_per_file(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "doc1.txt").write_text("hello world\nsecond line")
    (d / "doc2.txt").write_text("another document")

    df = M.read_text_corpus(spark, str(d))
    rows = sorted(df.collect(), key=lambda r: r["n_chars"])
    assert len(rows) == 2
    assert rows[0]["text"] == "another document"
    assert "\nsecond line" in rows[1]["text"]  # wholetext keeps newlines
    assert all(len(r["doc_key"]) == 32 for r in rows)


def test_orc_roundtrip_partitioned(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "etype", F.col("event_type")
    )
    out = str(tmp_path / "orc_lake")
    M.write_orc(ev, out, partition_cols=["etype"])
    back = M.read_orc(spark, out)
    assert back.count() == ev.count()
    # partition pruning: a filter on the partition col shows PartitionFilters
    pruned = back.filter(F.col("etype") == "click")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "etype" in plan.split("PartitionFilters")[1][:200]


def test_training_shards_roundtrip(spark, tmp_path):
    """Sharded write: deterministic key→shard mapping, all rows preserved,
    shard read prunes to one directory, file size bounded."""
    from pyspark.sql import functions as F

    from storm_data_etl_spark.sources.parquet import (
        read_training_shard,
        write_training_shards,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 97).alias("v")
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, n_shards=8, key_col="doc_id",
                          max_records_per_file=100)

    back = read_training_shard(spark, path)
    assert back.count() == 1000
    assert back.select("shard").distinct().count() == 8
    # mapping is the documented pure function of the key
    expected = df.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(8))
    )
    assert (
        back.select("doc_id", "shard")
        .exceptAll(expected.select("doc_id", "shard"))
        .count()
        == 0
    )
    # single-shard read prunes partitions
    one = read_training_shard(spark, path, shard=3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan or "shard#" in plan
    n3 = one.count()
    assert 0 < n3 < 1000
    # rewrite produces the identical mapping (reproducibility)
    path2 = str(tmp_path / "shards2")
    write_training_shards(df, path2, n_shards=8, key_col="doc_id")
    again = read_training_shard(spark, path2).select("doc_id", "shard")
    assert again.exceptAll(back.select("doc_id", "shard")).count() == 0

"""Kafka wiring tests (S1-S4).

Two tiers, mirroring the reference's split between unit-tested adapters and
a testcontainers e2e (internal/integration/kafka_pipeline_test.go:59-362):

1. Option-dict unit tests — always run. The reader/writer functions build
   their connector configuration through pure builders
   (kafka_batch_source_options / kafka_stream_source_options /
   kafka_sink_options), so the exact wiring the connector would receive is
   asserted without a broker or the spark-sql-kafka jar.

2. Real-broker e2e — gated on SPARK_GRAFT_KAFKA_BOOTSTRAP (compose file:
   docker-compose.kafka.yml). Replays the reference's 271-record pipeline:
   produce the raw combined fixture to a topic, read it back through
   read_kafka_batch, enrich, assert the exact golden counts (79/149/43)
   and San Saba spot values from kafka_pipeline_test.go:248-268, then
   serialize + produce the enriched events and re-read to verify the wire
   format round-trips. Requires the connector jar on the session classpath
   (SPARK_GRAFT_KAFKA_PACKAGES, default spark-sql-kafka-0-10).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import uuid

import pytest

from storm_data_etl_spark.sources.kafka import (
    DEFAULT_BATCH_SIZE,
    kafka_batch_source_options,
    kafka_sink_options,
    kafka_stream_source_options,
)

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
FIXTURE = "/root/reference/data/mock/storm_reports_240426_combined.json"


# ---------------------------------------------------------------------
# Tier 1: exact connector option dicts (no broker needed)
# ---------------------------------------------------------------------

def test_batch_source_options_exact():
    assert kafka_batch_source_options("host:9092", "storm.raw") == {
        "kafka.bootstrap.servers": "host:9092",
        "subscribe": "storm.raw",
        "startingOffsets": "earliest",
        "includeHeaders": "true",
    }


def test_stream_source_options_exact():
    assert kafka_stream_source_options("h1:9092,h2:9092", "storm.raw") == {
        "kafka.bootstrap.servers": "h1:9092,h2:9092",
        "subscribe": "storm.raw",
        "includeHeaders": "true",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
    }


def test_stream_source_options_batch_size_analog():
    opts = kafka_stream_source_options("h:9092", "t", DEFAULT_BATCH_SIZE)
    # maxOffsetsPerTrigger is the Spark analog of the reference's
    # BATCH_SIZE=50 (config.go:43-54) and must serialize as a string.
    assert opts["maxOffsetsPerTrigger"] == "50"
    assert all(isinstance(v, str) for v in opts.values())


def test_sink_options_exact():
    assert kafka_sink_options("h:9092", "storm.enriched") == {
        "kafka.bootstrap.servers": "h:9092",
        "kafka.acks": "all",
        "topic": "storm.enriched",
        "includeHeaders": "true",
    }


def test_reader_functions_use_builders():
    """The DataFrame-building functions must route through the builders —
    guard against the wiring drifting from the tested dicts."""
    import inspect

    from storm_data_etl_spark.sources import kafka as K

    assert "kafka_batch_source_options" in inspect.getsource(K.read_kafka_batch)
    assert "kafka_stream_source_options" in inspect.getsource(K.read_kafka_stream)
    assert "kafka_sink_options" in inspect.getsource(K.write_kafka_batch)


# ---------------------------------------------------------------------
# Tier 2: real-broker e2e (env-guarded)
# ---------------------------------------------------------------------

@pytest.mark.skipif(
    not BOOTSTRAP, reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker)"
)
@pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not available"
)
def test_kafka_271_record_round_trip():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from storm_data_etl_spark.functions.enrich import enrich_envelope
    from storm_data_etl_spark.sources.kafka import (
        read_kafka_batch,
        serialize_events,
        write_kafka_batch,
    )

    packages = os.environ.get(
        "SPARK_GRAFT_KAFKA_PACKAGES",
        "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2",
    )
    spark = (
        SparkSession.builder.appName("kafka-e2e")
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.jars.packages", packages)
        .getOrCreate()
    )
    raw_topic = f"storm.raw.{uuid.uuid4().hex[:8]}"
    out_topic = f"storm.enriched.{uuid.uuid4().hex[:8]}"

    # Produce the 271 raw records (one JSON value per message), Spark-side —
    # no separate Kafka client needed.
    raw = json.load(open(FIXTURE))
    msgs = spark.createDataFrame(
        [(json.dumps(r).encode(),) for r in raw], "value binary"
    )
    write_kafka_batch(msgs, BOOTSTRAP, raw_topic)

    # Consume → envelope → enrich: the reference's full pipeline shape.
    envelopes = read_kafka_batch(spark, BOOTSTRAP, raw_topic)
    enriched = enrich_envelope(
        envelopes, processed_at="2024-04-27 06:00:00"
    ).cache()

    counts = {
        r.event_type: r["count"]
        for r in enriched.groupBy("event_type").count().collect()
    }
    assert counts == {"hail": 79, "tornado": 149, "wind": 43}

    saba = enriched.filter(
        (F.col("location.county") == "San Saba")
        & (F.col("location.raw") == "8 ESE Chappel")
    ).collect()[0]
    assert saba.measurement.magnitude == 1.25
    assert saba.measurement.severity == "moderate"
    assert saba.location.name == "Chappel"
    assert saba.location.distance == 8.0
    assert saba.location.direction == "ESE"
    assert saba.source_office == "SJT"
    assert saba.time_bucket == dt.datetime(2024, 4, 26, 15, 0)

    # Serialize + produce the enriched stream, then re-read and verify the
    # wire format round-trips (key = id bytes, headers carry event_type).
    write_kafka_batch(serialize_events(enriched), BOOTSTRAP, out_topic)
    echoed = read_kafka_batch(spark, BOOTSTRAP, out_topic).cache()
    assert echoed.count() == 271
    one = echoed.limit(1).collect()[0]
    payload = json.loads(bytes(one.value))
    assert bytes(one.key).decode() == payload["id"]
    hdr = {bytes(h.key).decode(): bytes(h.value).decode() for h in one.headers}
    assert hdr["event_type"] == payload["event_type"]
    enriched.unpersist()
    echoed.unpersist()

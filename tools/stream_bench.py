"""Streaming-path throughput benchmark: rows/sec through the FULL
Structured Streaming pipeline (file-source envelopes → parse → enrich →
foreachBatch noop sink, dead-letter split included).

The reference's only published performance numbers are streaming: 11-100
msg/s single-instance through its Kafka pipeline and "a full day (≤5,000
records) in seconds" (BASELINE.md). bench.py's enrich_throughput measures
the BATCH hot path; this tool measures the same dataflow under the
streaming runtime — micro-batch scheduling, checkpointing, and the
poison-pill split included — so the streaming claim rests on a streaming
measurement.

Usage: python tools/stream_bench.py [n_rows] [poison_every]
Prints one JSON line {"metric": "stream_enrich_rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from storm_data_etl_spark.session import get_spark


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    poison_every = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("stream-bench", master=f"local[{cpus}]")

    from storm_data_etl_spark.schema import ENVELOPE_SCHEMA  # noqa: F401
    from storm_data_etl_spark.streaming.pipeline import run_pipeline

    work = tempfile.mkdtemp(prefix="stream_bench_")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    # Synthesize raw storm-report envelopes as JSON-lines files (the
    # file-source stand-in for Kafka partitions), one poison pill per
    # `poison_every` rows so the dead-letter split is on the hot path.
    gen = spark.range(n_rows).select(
        F.when(
            F.col("id") % poison_every == 0, F.lit("not-json{{{")
        )
        .otherwise(
            F.to_json(
                F.struct(
                    F.date_format(
                        F.timestamp_seconds(1714089600 + F.col("id") % 86_400),
                        "HHmm",
                    ).alias("Time"),
                    F.format_string("%.2f", 1 + (F.col("id") % 300) / 100.0).alias(
                        "Size"
                    ),
                    F.lit("").alias("F_Scale"),
                    F.lit("").alias("Speed"),
                    F.concat(F.lit("5 NW Site"), F.col("id") % 97).alias("Location"),
                    F.lit("County").alias("County"),
                    F.lit("TX").alias("State"),
                    F.format_string("%.2f", 30 + (F.col("id") % 500) / 100.0).alias(
                        "Lat"
                    ),
                    F.format_string("%.2f", -99 - (F.col("id") % 500) / 100.0).alias(
                        "Lon"
                    ),
                    F.lit("observed. (OUN)").alias("Comments"),
                    F.lit("hail").alias("EventType"),
                )
            )
        )
        .alias("value")
    )
    gen.coalesce(8).write.mode("overwrite").text(src)

    counters = {"rows": 0, "dead": 0}

    def sink(batch_df, batch_id: int) -> None:  # noqa: ANN001
        counters["rows"] += batch_df.count()

    def dead_sink(batch_df, batch_id: int) -> None:  # noqa: ANN001
        counters["dead"] += batch_df.count()

    from storm_data_etl_spark.streaming.pipeline import text_stream_to_envelope

    envelope = text_stream_to_envelope(
        spark.readStream.format("text").load(src), topic="bench"
    )

    start = time.perf_counter()
    q = run_pipeline(
        spark,
        envelope,
        checkpoint_dir=ckpt,
        sink=sink,
        dead_letter_sink=dead_sink,
        processed_at="2024-04-27 06:00:00",
    )
    q.processAllAvailable()
    q.stop()
    elapsed = time.perf_counter() - start

    shutil.rmtree(work, ignore_errors=True)
    good = counters["rows"]
    print(
        json.dumps(
            {
                "metric": "stream_enrich_rows_per_sec",
                "value": round(good / elapsed, 1),
                "unit": "rows/sec",
                "rows": good,
                "dead_letter": counters["dead"],
                "elapsed_sec": round(elapsed, 3),
            }
        )
    )
    expected_dead = (n_rows + poison_every - 1) // poison_every
    assert good == n_rows - expected_dead, (good, n_rows, expected_dead)
    assert counters["dead"] == expected_dead
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

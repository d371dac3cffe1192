"""Declared schemas for the storm-report data model.

Mirrors the reference's fixed Go-struct schemas (never inferred):
- RawCSVRecord: /root/reference/internal/domain/event.go:11-23 — 11 string
  fields, exact JSON key casing.
- StormEvent (+ nested Geo/Measurement/Location): event.go:41-89.
- RawEvent envelope: event.go:26-35 — matches Spark's Kafka source columns.

Sentinel conventions (SURVEY.md §1.3):
- invalid event type / unit / office → literal '' (NOT null)
- severity / distance / direction    → NULL
- Go zero time                       → NULL timestamp
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Flat CSV-style JSON produced by the upstream collector. All strings.
RAW_SCHEMA = T.StructType(
    [
        T.StructField("Time", T.StringType()),
        T.StructField("Size", T.StringType()),      # hail magnitude (hundredths of inches)
        T.StructField("F_Scale", T.StringType()),   # tornado magnitude (EF scale)
        T.StructField("Speed", T.StringType()),     # wind magnitude (mph)
        T.StructField("Location", T.StringType()),  # NWS relative location, e.g. "8 ESE Chappel"
        T.StructField("County", T.StringType()),
        T.StructField("State", T.StringType()),
        T.StructField("Lat", T.StringType()),
        T.StructField("Lon", T.StringType()),
        T.StructField("Comments", T.StringType()),
        T.StructField("EventType", T.StringType()),  # "hail" | "wind" | "tornado"
    ]
)

GEO_SCHEMA = T.StructType(
    [
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)

MEASUREMENT_SCHEMA = T.StructType(
    [
        T.StructField("magnitude", T.DoubleType()),
        T.StructField("unit", T.StringType()),
        T.StructField("severity", T.StringType()),  # nullable
    ]
)

LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("raw", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("distance", T.DoubleType()),   # nullable
        T.StructField("direction", T.StringType()),  # nullable
        T.StructField("state", T.StringType()),
        T.StructField("county", T.StringType()),
    ]
)

#: Enriched StormEvent (silver). Nested like the reference wire format.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("geo", GEO_SCHEMA),
        T.StructField("measurement", MEASUREMENT_SCHEMA),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("location", LOCATION_SCHEMA),
        T.StructField("comments", T.StringType()),
        T.StructField("source_office", T.StringType()),
        T.StructField("time_bucket", T.TimestampType()),
        T.StructField("processed_at", T.TimestampType()),
    ]
)

#: Kafka message envelope — identical to Spark's Kafka source schema
#: (key/value binary, headers array<struct<key,value>>, topic/partition/offset,
#: timestamp). The reference's RawEvent holds the same fields.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType()),
                    ]
                )
            ),
        ),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

#: Output enum domains enforced by the validation suite
#: (/root/reference/cmd/validate/main.go:475-479).
EVENT_TYPES = ("hail", "wind", "tornado")
UNITS = ("in", "mph", "f_scale")
SEVERITIES = ("minor", "moderate", "severe", "extreme")

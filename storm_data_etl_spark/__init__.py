"""storm_data_etl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of couchcryptid/storm-data-etl.

The reference (/root/reference, Go) is a Kafka→Kafka ETL for NOAA SPC storm
reports plus two analytic CLIs (genmock, validate). This package re-expresses
that surface Spark-first:

- ``schema``     — declared StructTypes (raw CSV-JSON, enriched event, Kafka envelope)
- ``functions``  — pure Column expression libraries (enrichment, text, vectors)
- ``sources``    — batch/stream readers & writers (CSV, JSON, parquet, Kafka)
- ``operators``  — relational/dedup/similarity operators (filters, aggs, joins,
                   first-wins dedup, MinHash-LSH, SimHash, ANN)
- ``plans``      — end-to-end query plans (genmock stats report, validate phases)
- ``streaming``  — Structured Streaming pipeline wrapper (enrich + dead-letter)

All core expressions are Catalyst built-ins (zero Python UDFs in the hot
path); Pandas UDFs appear only where DataFrame ops cannot express the
semantics (documented per call site).
"""

__version__ = "0.1.0"

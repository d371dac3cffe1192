"""Batch & streaming sources/sinks: NOAA CSV, JSON fixtures, Kafka, parquet."""

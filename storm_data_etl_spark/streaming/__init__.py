"""Structured Streaming wrapper around the batch enrichment core."""

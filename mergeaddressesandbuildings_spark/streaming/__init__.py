"""Structured-Streaming surface (SURVEY.md §2.10)."""

from mergeaddressesandbuildings_spark.streaming import ingest

__all__ = ["ingest"]

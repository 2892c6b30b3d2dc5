"""Structured Streaming surface (SURVEY §2B B44-B46): windowed aggregation,
session windows, watermarked stateful dedup. Importing registers the q44*
manifest queries."""

from limeqo_spark.streaming import queries  # noqa: F401

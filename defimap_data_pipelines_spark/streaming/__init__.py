"""Structured Streaming variants of the batch transforms."""

from defimap_data_pipelines_spark.streaming.jobs import (  # noqa: F401
    stream_bronze_to_silver,
    stream_session_windows,
    stream_tumbling_counts,
)

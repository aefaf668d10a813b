"""spark.sql front-end: the same operators as SQL text over registered
views (SURVEY.md §7 — optional SQL surface; Catalyst produces the same
plan either way)."""

from defimap_data_pipelines_spark.sql.frontend import (  # noqa: F401
    GOTK_SPARK_SQL,
    register_raw_series_view,
    sql_gotk,
)

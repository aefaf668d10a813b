"""End-to-end pipeline compositions (extract -> transform -> load).

The reference's three Airflow DAGs (SURVEY.md §3) become three plain
functions over DataFrames; cross-DAG sensors/triggers disappear because
dependencies are explicit dataflow within one Spark app.
"""

from defimap_data_pipelines_spark.pipelines.transform import run_transform  # noqa: F401
from defimap_data_pipelines_spark.pipelines.ingest import (  # noqa: F401
    clean_bronze,
    sample_chain_state,
)

"""DataFrame -> DataFrame operators: the engine's public surface."""

from defimap_data_pipelines_spark.operators.growth import (  # noqa: F401
    benchmark_gotk,
    growth_of_10k,
    price_gotk,
)
from defimap_data_pipelines_spark.operators.tvl import tvl  # noqa: F401
from defimap_data_pipelines_spark.operators.trailing import (  # noqa: F401
    compounded_return,
    trailing_returns,
    trailing_returns_naive,
)
from defimap_data_pipelines_spark.operators.risk import risk_metrics  # noqa: F401
from defimap_data_pipelines_spark.operators.cleaning import (  # noqa: F401
    fillna_zero,
    interpolate_linear,
)

from dbt_lakehouse_aws_spark.operators.windows import (
    global_row_number,
    ranked_in_group,
    top_k_per_group,
)
from dbt_lakehouse_aws_spark.operators.aggregates import (
    ensemble_avg,
    pivot_wide,
    regression_slope,
    unpivot_long,
)
from dbt_lakehouse_aws_spark.operators.relational import cast_columns, when_chain

__all__ = [
    "global_row_number",
    "ranked_in_group",
    "top_k_per_group",
    "ensemble_avg",
    "pivot_wide",
    "regression_slope",
    "unpivot_long",
    "cast_columns",
    "when_chain",
]

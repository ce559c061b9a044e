"""Overnight/day beds series (2010-24 quarterly shape).

Era specifics on top of the generic runner
(build_datasets_overnight_day_beds.R:279-560): positional SHA drop
(:355-357), all-null spacer columns x11/x17 (:308-311), fiscal year
range "2019-20" + period-end month -> calendar (year, quarter)
(:364-403), and the percent-occupied ratio that must be *recomputed*
after any re-aggregation because ratios don't sum (:528-539).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.functions import (
    fiscal_quarter_from_month,
    fiscal_range_to_calendar_year,
    safe_div,
    to_numeric,
)
from nhs_data_pipeline_spark.ops.core import drop_all_null_columns


MONTH_NUM = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10, "november": 11,
    "december": 12,
}


def harmonize_beds_quarterly(
    df: DataFrame,
    year_range_col: str = "year",
    period_col: str = "period_end",
    measure_cols: Sequence[str] = (),
) -> DataFrame:
    """Era harmonization for the 2010-24 quarterly beds shape: drop
    spacer columns, coerce measures, map (fiscal range, period-end
    month) -> calendar (year, quarter)."""
    out = drop_all_null_columns(df)
    for c in measure_cols:
        if c in out.columns:
            out = out.withColumn(c, to_numeric(c))
    month_expr = F.lower(F.col(period_col))
    month_num = F.element_at(
        F.create_map(*[x for k, v in MONTH_NUM.items() for x in (F.lit(k), F.lit(v))]),
        month_expr,
    )
    return (
        out.withColumn("quarter", fiscal_quarter_from_month(month_num))
        .withColumn(
            "calendar_year",
            fiscal_range_to_calendar_year(F.col(year_range_col), month_expr),
        )
    )


def with_occupancy(
    df: DataFrame, occupied: str, available: str, out: str = "percent_occupied"
) -> DataFrame:
    """percent occupied = occupied/available, NULL on zero beds —
    always derived AFTER aggregation (ratios don't sum; the 2000-01
    inverted-ratio bug in the reference is documented-and-diverged:
    the golden CSV and the re-aggregation path both use
    occupied/available, which is what this computes)."""
    return df.withColumn(out, safe_div(F.col(occupied), F.col(available)))

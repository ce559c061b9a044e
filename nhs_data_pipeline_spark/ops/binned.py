"""Binned-distribution statistics (W5/W6).

The reference computes the RTT median wait and percent-within-18-weeks
from *binned* weekly wait-count columns: unpivot to long, cumulative sum
over ordered bins, locate the bin where the cumulative share crosses a
threshold (scripts/wait-times/build_datasets_wait_times.R:508-536).

These are engine-level composites of window ops — there is no single
Spark primitive. Inputs are long-form: one row per (group, bin), with a
numeric bin lower bound and a count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.functions import safe_div


def binned_median(
    df: DataFrame,
    keys: Sequence[str],
    bin_lower: str,
    count: str,
    midpoint_offset: float = 0.5,
) -> DataFrame:
    """Median from a binned distribution: the first bin (by lower bound)
    where the cumulative share crosses 0.5; the median estimate is that
    bin's lower bound + ``midpoint_offset``.

    W5 — build_datasets_wait_times.R:523-529 (``cumulative_percent >= 0.5
    & lag(cumulative_percent) < 0.5`` then lower bound + 0.5). Returns one
    row per group: ``keys + [median]``. NULL when the group's total is 0
    or all counts are NULL.
    """
    wg = Window.partitionBy(*keys)
    wo = (
        Window.partitionBy(*keys)
        .orderBy(bin_lower)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        df.withColumn("__total", F.sum(count).over(wg))
        .withColumn("__cum", F.sum(count).over(wo))
        .withColumn("__cum_pct", safe_div(F.col("__cum"), F.col("__total")))
    )
    wl = Window.partitionBy(*keys).orderBy(bin_lower)
    crossing = cum.withColumn("__prev_pct", F.lag("__cum_pct").over(wl)).withColumn(
        "median",
        F.when(
            (F.col("__cum_pct") >= 0.5)
            & (F.col("__prev_pct").isNull() | (F.col("__prev_pct") < 0.5)),
            F.col(bin_lower) + F.lit(midpoint_offset),
        ),
    )
    return crossing.groupBy(*keys).agg(F.min("median").alias("median"))


def pct_within_threshold(
    df: DataFrame,
    keys: Sequence[str],
    bin_lower: str,
    count: str,
    threshold: float,
) -> DataFrame:
    """Share of the distribution in bins strictly below ``threshold``
    (e.g. percent treated within 18 weeks = cumulative count through the
    17-18 bin / total).

    W6 — build_datasets_wait_times.R:515-520. NULL when total is 0 (the
    reference maps percent to NA when the denominator is 0,
    build_datasets_wait_times.R:176-191). One aggregate, no window.
    """
    return df.groupBy(*keys).agg(
        safe_div(
            # no (non-null) counts below the threshold means 0% within,
            # not unknown — but only when the group has a real total
            F.coalesce(
                F.sum(F.when(F.col(bin_lower) < threshold, F.col(count))),
                F.lit(0.0),
            ),
            F.sum(count),
        ).alias("pct_within")
    )

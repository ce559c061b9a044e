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


def winsorize_stats(
    df: DataFrame,
    value_int_col: str,
    group_cols: list[str],
    lower_q: float = 0.01,
    upper_q: float = 0.99,
) -> DataFrame:
    """Per-group winsorization audit on an INTEGER-unit value column:
    clip values to the exact [lower_q, upper_q] order statistics and
    report ``(*group_cols, n, lo, hi, n_clipped_low, n_clipped_high,
    mean_after)`` — the standard heavy-tail taming step before
    quality-score thresholds or feature scaling.

    The bound at quantile q is the ceil(q*n)-th smallest value
    (clamped >= 1) with the ceiling computed in EXACT integer
    arithmetic via ``Fraction`` — the build-notes float-ceil trap —
    so bounds are engine-exact order statistics, not interpolations.
    Clipping and counting stay all-integer; ``mean_after`` is the one
    double (single division of two exact integers). Shape: one sort
    shuffle for the per-group ranks (the exact-percentile cost), one
    map-side-combinable aggregate; bound rows are group-sized and
    broadcast back.

    NULL values are EXCLUDED everywhere (ranks, n, clip counts, the
    mean): a NULL cannot be an order statistic — left in, NULLs sort
    first, shift the ceil(q*n) ranks, and a bound landing on a NULL
    row silently no-ops the clip while the mean divides by a count
    that includes unclippable rows (the r05 advisor catch). Groups
    whose values are ALL NULL disappear from the output."""
    from fractions import Fraction

    fr_lo, fr_hi = Fraction(str(lower_q)), Fraction(str(upper_q))
    df = df.filter(F.col(value_int_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(value_int_col)
    ranked = df.select(*group_cols, value_int_col).withColumn(
        "__rk", F.row_number().over(w)
    )
    ns = ranked.groupBy(*group_cols).agg(F.count("*").alias("__n"))

    def _rank(fr: Fraction):
        return F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(f"({fr.numerator} * __n + {fr.denominator} - 1) div {fr.denominator}"),
        )

    bounds_rk = ns.select(
        *group_cols, _rank(fr_lo).alias("__rlo"), _rank(fr_hi).alias("__rhi")
    )
    # NULL-safe group joins (a NULL group key must winsorize like any
    # other group, not silently vanish — the build-notes NULL-key trap)
    from nhs_data_pipeline_spark.ops.sketch import _ns_join

    ranked2 = _ns_join(ranked, bounds_rk, group_cols, broadcast_right=True)
    bounds = ranked2.groupBy(*group_cols).agg(
        F.max(F.when(F.col("__rk") == F.col("__rlo"), F.col(value_int_col))).alias("lo"),
        F.max(F.when(F.col("__rk") == F.col("__rhi"), F.col(value_int_col))).alias("hi"),
    )
    clipped = _ns_join(
        df.select(*group_cols, value_int_col), bounds, group_cols,
        broadcast_right=True,
    )
    v = F.col(value_int_col)
    cv = F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    return clipped.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("lo").alias("lo"),
        F.min("hi").alias("hi"),
        F.sum(F.when(v < F.col("lo"), 1).otherwise(0)).cast("bigint").alias("n_clipped_low"),
        F.sum(F.when(v > F.col("hi"), 1).otherwise(0)).cast("bigint").alias("n_clipped_high"),
        (
            F.sum(cv.cast("decimal(38,0)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_after"),
    )

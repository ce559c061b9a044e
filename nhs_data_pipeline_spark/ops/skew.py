"""Skew-resistant aggregation (two-phase salted group-by).

At 100 TB a handful of hot keys (the 'England' aggregate rows, a
mega-trust, an empty-string org code) can pin a groupBy shuffle on one
reducer. The classic fix: salt the key into ``n`` sub-keys, aggregate
partially per (key, salt), then aggregate the partials — two small
shuffles instead of one skewed one. Results are bit-identical to the
direct group-by for decomposable aggregates (sum/count/min/max).

AQE's skew-join splitting handles *join* skew automatically; aggregate
skew still benefits from explicit salting, so the engine ships it as a
first-class op.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_grouped_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt_buckets: int = 16,
    count_col: str | None = None,
) -> DataFrame:
    """Two-phase NA-preserving grouped sum with salted first phase.

    Deterministic salt (hash of all columns' first sum col + a spread
    term) is irrelevant to correctness — any row-to-bucket assignment
    gives the same final sums; ``monotonically_increasing_id`` spreads
    rows evenly without requiring a salt column in the data.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    phase1_aggs = [F.sum(c).alias(c) for c in sum_cols]
    if count_col is not None:
        phase1_aggs.append(F.count("*").alias(count_col))
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    phase2_aggs = [F.sum(c).alias(c) for c in sum_cols]
    if count_col is not None:
        phase2_aggs.append(F.sum(count_col).alias(count_col))
    return partial.groupBy(*keys).agg(*phase2_aggs)

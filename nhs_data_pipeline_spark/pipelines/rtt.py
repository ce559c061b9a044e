"""RTT wait-times series: binned-statistics recomputation.

After org-change re-aggregation sums the weekly wait-bin columns,
the ratio/percentile columns must be re-derived from the merged bins
(build_datasets_wait_times.R:508-536): unpivot bins to long (R1),
cumulative counts over ordered bins (W1/W2), percent-within-18-weeks
(W6) and the binned median (W5), then re-attach the per-group scalars
to the wide panel (R2).

Composes the engine's ops; one unpivot + one windowed pass over
(groups x bins) — cardinality is #groups x ~53 regardless of input
row count, so the stage is negligible at any scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.functions import bin_lower_bound
from nhs_data_pipeline_spark.ops.binned import binned_median, pct_within_threshold
from nhs_data_pipeline_spark.ops.core import natural_join, unpivot


def recompute_binned_stats(
    df: DataFrame,
    keys: Sequence[str],
    bin_cols: Sequence[str] | None = None,
    threshold: float = 18.0,
    median_col: str = "median_waiting_time_in_weeks",
    pct_col: str = "percent_within_18_weeks",
) -> DataFrame:
    """Re-derive percent-within-threshold and the binned median from
    ``between_*`` wait-bin columns, per group.

    ``bin_cols`` defaults to every column matching ``between_<n>_...``;
    bin order comes from the numeric lower bound embedded in the name
    (F1 — "between_17_18" -> 17), so era-variant bin sets need no
    special-casing.
    """
    keys = list(keys)
    if bin_cols is None:
        bin_cols = [c for c in df.columns if bin_lower_from_name(c) is not None]
    long = unpivot(df.select(*keys, *bin_cols), keys, list(bin_cols), "name", "count")
    long = long.withColumn("bin_lower", bin_lower_bound("name"))

    med = binned_median(long, keys, "bin_lower", "count").withColumnRenamed(
        "median", median_col
    )
    pct = pct_within_threshold(long, keys, "bin_lower", "count", threshold).withColumnRenamed(
        "pct_within", pct_col
    )
    # RECOMPUTE means recompute: pre-existing stat columns must be
    # dropped first — natural_join would otherwise treat them as join
    # keys, the stale value never matches the fresh one, and the left
    # join silently keeps the OLD numbers.
    base = df.drop(pct_col, median_col)
    out = natural_join(base, pct, how="left")
    return natural_join(out, med, how="left")


def bin_lower_from_name(name: str) -> float | None:
    """Python-side twin of functions.bin_lower_bound for plan-build-time
    column selection."""
    import re

    m = re.search(r"^between_(\d+)", name)
    return float(m.group(1)) if m else None


def prefix_measures(df: DataFrame, prefix: str, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-pathway measure prefixing (F5 — ``paste0(pathway, "_", names)``,
    build_datasets_wait_times.R:53,194-205): admitted/non_admitted/
    incomplete panels share a schema, distinguished by column prefix
    before the cross-pathway natural join."""
    from nhs_data_pipeline_spark.ops.core import rename_columns

    if cols is None:
        cols = [c for c in df.columns if c.startswith(("between_", "total_", "percent_"))]
    return rename_columns(df, {c: f"{prefix}_{c}" for c in cols})

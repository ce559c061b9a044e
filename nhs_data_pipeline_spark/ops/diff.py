"""Snapshot diff — CDC-style comparison of two table versions.

A warehouse/feature-store pipeline that re-lands a full snapshot each
period needs the delta: which keys appeared, vanished, or changed, and
WHICH columns changed (for selective downstream invalidation). The
reference rebuilds cleaned panels from scratch each quarter
(build_datasets_main.py:200-296 re-derives the whole panel); diffing
consecutive panel versions is the scalable incremental twin.

Spark-first shape: one full-outer shuffle join on the key (the only
shuffle), null-safe per-column comparison as a codegen'd projection,
change-list as array_compact over per-column CASE expressions. No UDFs,
no collect; at 100 TB the join is the cost and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    status_col: str = "diff_status",
    changed_col: str = "changed_columns",
) -> DataFrame:
    """Full-outer diff of ``new`` vs ``old`` on ``keys``.

    Returns one row per key present in either snapshot with:
    - the key columns;
    - ``status_col``: added | removed | changed | unchanged;
    - ``changed_col``: sorted array of compared column names whose
      values differ (null-safe: NULL->value and value->NULL count as
      changes, NULL->NULL does not); empty array unless status is
      ``changed`` — added/removed rows get an empty array, NOT the
      full column list the raw null-safe compare would produce, so
      ``size(changed_columns) > 0`` is a safe 'changed' predicate;
    - the compared columns' NEW values (OLD values for removed rows),
      so the output is directly upsertable.

    ``compare_cols`` defaults to the non-key columns present in BOTH
    snapshots (schema-drift columns are ignored, not flagged).
    """
    if compare_cols is None:
        new_cols = set(new.columns)
        compare_cols = [c for c in old.columns if c in new_cols and c not in keys]

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        # Null-safe: a NULL-key row present in both snapshots must be
        # COMPARED (one changed/unchanged row), not reported as an
        # added+removed pair — merge_upsert matches null-safely, so a
        # plain == here would break the diff-then-merge identity.
        eq = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")

    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_arr = (
        F.sort_array(F.array_compact(F.array(*diffs)))
        if diffs
        else F.array().cast("array<string>")
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit(ADDED))
        .when(F.col("__in_new").isNull(), F.lit(REMOVED))
        .when(F.size(changed_arr) > 0, F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    # For added/removed rows one side is all-NULL, so the raw compare
    # would list every non-null column; the contract is that the array
    # is only meaningful (and non-empty) for status == changed.
    both = F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull()
    changed_out = F.when(both, changed_arr).otherwise(
        F.array().cast("array<string>")
    )
    out_keys = [
        F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k) for k in keys
    ]
    out_vals = [
        F.when(F.col("__in_new").isNull(), F.col(f"__o_{c}"))
        .otherwise(F.col(f"__n_{c}"))
        .alias(c)
        for c in compare_cols
    ]
    return j.select(
        *out_keys,
        status.alias(status_col),
        changed_out.alias(changed_col),
        *out_vals,
    )


def diff_summary(
    diff: DataFrame, status_col: str = "diff_status"
) -> DataFrame:
    """Tiny per-status rollup of a ``snapshot_diff`` result — the
    monitoring row a pipeline logs per landing."""
    return diff.groupBy(status_col).agg(F.count("*").alias("n"))

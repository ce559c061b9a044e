"""Skew-resistant aggregation and joins (salting).

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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key space into
    ``salt_buckets`` sub-keys and replicate the small side once per
    bucket, so a hot key's rows spread over ``salt_buckets`` reducers
    instead of pinning one.

    Semantically identical to ``big.join(small, keys, how)`` — the salt
    only changes row placement — so it stays exactly oracle-checkable.
    Use when the small side is too big to broadcast outright but cheap
    to replicate 8-16x (the classic mid-size dimension against a skewed
    fact), and AQE's runtime skew splitting isn't available (e.g. the
    shuffle feeds a co-partitioned downstream op) or the skew is known
    up front. Supports 'inner' and 'left' (the big side preserved).

    The big side's salt is deterministic spread (same device as
    ``salted_grouped_sum``); the small side gets a compact
    ``explode(sequence(...))`` replication — one narrow stage, no
    driver loop.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    b = big.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int"),
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(s, [*keys, "__salt"], how).drop("__salt")


def diagnose_join_skew(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 5,
    target_rows_per_task: int = 5_000_000,
) -> DataFrame:
    """Pre-join skew diagnosis for a prospective join/aggregation key:
    the ``top_k`` heaviest keys with global context —
    ``(*key_cols, key_rows, n_rows, n_keys, key_share, skew_factor,
    suggested_salt)`` where ``skew_factor = key_rows * n_keys /
    n_rows`` (how many times heavier than the mean key — >> 1 means
    the shuffle partition holding that key becomes the straggler) and
    ``suggested_salt = ceil(max_key_rows / target_rows_per_task)``
    (the salt_buckets to hand :func:`salted_join`, integer-exact
    ceiling — the float-ceil trap).

    This is the look-before-you-shuffle step at 100 TB: one map-side-
    combinable count per key, one scalar aggregate, and a top-k over
    the key-count table — no joins at all; NULL keys diagnose like
    any other key (they are often THE hot key). All integer counts;
    ``key_share``/``skew_factor`` are single exact-int divisions.

    The top-k is ``orderBy(...).limit(k)`` — TakeOrderedAndProject,
    a fully distributed per-partition heap + driver merge of k rows.
    An un-partitioned row_number window here would global-sort the
    key-count table on ONE task — key-cardinality-sized, i.e.
    corpus-scale for exactly the high-cardinality keys this tool
    exists to diagnose (the r05 advisor catch)."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("key_rows"))
    top = counts.orderBy(
        F.desc("key_rows"), *[F.asc_nulls_first(k) for k in key_cols]
    ).limit(top_k)
    tot = counts.agg(
        F.sum("key_rows").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("key_rows").cast("bigint").alias("__max"),
    )
    out = top.crossJoin(F.broadcast(tot))
    return out.select(
        *key_cols,
        "key_rows",
        "n_rows",
        "n_keys",
        (F.col("key_rows").cast("double") / F.col("n_rows").cast("double")).alias("key_share"),
        (
            (F.col("key_rows") * F.col("n_keys")).cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_factor"),
        F.expr(
            f"(__max + {target_rows_per_task} - 1) div {target_rows_per_task}"
        ).cast("bigint").alias("suggested_salt"),
    )

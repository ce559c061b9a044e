"""Count-min sketch: mergeable frequency estimation over key streams.

The count-min sketch (Cormode & Muthukrishnan 2005, public) answers
"how often does key x occur?" from d*w integer counters instead of a
full-vocabulary aggregate: d hash rows, each mapping a key into one of
w buckets; estimate = min over rows of the landed cell. Estimates
never undercount (every collision only adds), and sketches are
MERGEABLE by cell-wise addition — the property that matters at 100 TB:
build one tiny sketch per shard/day/source, answer global frequency
questions by summing sketch tables, never rescanning the raw stream.

Spark-first shape (100 TB design)
---------------------------------
- The sketch IS a DataFrame ``(shard..., row, bucket, cnt)`` of at
  most d*w rows per shard — aggregation combines map-side, the
  shuffle carries (row, bucket) ints, and "persist the sketch" is an
  ordinary tiny table write.
- Merging shards is a groupBy(row, bucket) SUM — no sketch-library
  binary blobs, no driver round-trip, re-aggregatable at any shard
  granularity.
- Point queries broadcast the (small) candidate-key table, compute
  each candidate's d buckets, join the d*w cell table, and take
  min() per key — one broadcast join against a model-sized table.

Cross-engine determinism
------------------------
Unlike HLL binaries, every cell is an exact integer under the
engine-portable md5-prefix hash (``llm/dedup._MD5_H60`` over
``key || '#' || row``), so the whole sketch — and every estimate —
replays bit-for-bit in any engine with md5(): the one approximate
operator in the registry whose *approximation itself* is
exact-oracle-checkable (sketch_approx_distinct / sketch_quantiles /
sketch_hll_mergeable are rows-only by necessity; this one is not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm.dedup import _MD5_H60


def _salted_bucket_expr(key_sql: str, row_sql: str, w: int) -> Column:
    """Portable bucket of ``key_sql`` under hash row ``row_sql``:
    md5-prefix integer of ``key # row`` mod w. The '#'-salt derives d
    independent-enough hash functions from one digest family (keys
    containing '#' stay deterministic — both engines salt
    identically). NULL keys hash via the build-notes chr(0) sentinel —
    a NULL bucket would silently drop the row from every cell join
    (the documented NULL-key trap); a literal chr(0) key aliases with
    NULL, documented and harmless for counting."""
    salted = f"concat(coalesce({key_sql}, chr(0)), '#', cast({row_sql} as string))"
    return F.pmod(F.expr(_MD5_H60.format(x=salted)), F.lit(w))


def cm_sketch(
    df: DataFrame,
    key_col: str,
    d: int = 3,
    w: int = 256,
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Build the sketch table ``(*shard_cols, row, bucket, cnt)`` from
    a key stream (one input row = one occurrence). With ``shard_cols``
    the result is one independent sketch per shard — merge them with
    :func:`cm_merge`."""
    shards = shard_cols or []
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    exploded = df.select(F.col(key_col).alias("__k"), *shards, rows)
    return (
        exploded.select(
            *shards,
            "row",
            _salted_bucket_expr("__k", "row", w).alias("bucket"),
        )
        .groupBy(*shards, "row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_merge(sketch: DataFrame) -> DataFrame:
    """Merge per-shard sketches into one global sketch by cell-wise
    addition — exact over sketches (the mergeability property)."""
    return sketch.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    d: int = 3,
    w: int = 256,
) -> DataFrame:
    """Point-estimate each candidate key's frequency from a (merged)
    sketch: ``min`` over the d landed cells. Returns EVERY candidate
    row with ``est_n`` appended. Never undercounts; cells the key
    alone occupies give the exact count. Cells absent from the sketch
    table are empty counters (0): the join is a LEFT join with a
    coalesce, so a never-seen candidate correctly estimates 0 instead
    of being dropped (or, worse, over-estimated from only its
    colliding cells — review finding)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    probes = candidates.select("*", rows).withColumn(
        "bucket", _salted_bucket_expr(key_col, "row", w)
    )
    carry = [c for c in candidates.columns]
    return (
        probes.join(sketch, ["row", "bucket"], "left")
        .groupBy(*carry)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_n"))
    )

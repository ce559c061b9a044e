"""Sinks.

Default sink is parquet (partitioned, predicate-pushdown-friendly); the
single-file CSV sink exists for golden-file parity with the reference's
``write.csv`` outputs (S9 — build_datasets_wait_times.R:558-567).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_single_csv(
    df: DataFrame,
    path: str,
    order_by: list[str] | None = None,
    null_value: str = "",
) -> str:
    """Write one headered CSV file at ``path`` (reference parity:
    ``to_csv(index=False)``, scripts/build_datasets_main.py:289).

    ``coalesce(1)`` is correct *only* for reference-sized outputs (tens
    of thousands of rows); large results should use ``write_parquet``.
    An optional sink-time sort reproduces the reference's ordered CSVs
    (O1 — ``arrange(org_code, year, quarter)``); ``null_value="NA"``
    reproduces R ``write.csv``'s NA rendering.
    """
    if order_by:
        df = df.orderBy(*order_by)
    tmp = path + "__tmp"
    (df.coalesce(1).write.mode("overwrite").option("header", True)
       .option("nullValue", null_value).option("emptyValue", "")
       .csv(tmp))
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> str:
    """Canonical sink: parquet, optionally hive-partitioned so downstream
    readers get partition pruning for free."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Bucketed managed-table sink: co-locates rows by hash(bucket_cols)
    at WRITE time so every later equi-join or aggregation on those
    columns skips its shuffle (Exchange) entirely.

    The scale play: fact tables that are repeatedly joined on the same
    key (lineitem/orders on orderkey; panels on org_code) pay one
    bucketed write, then every downstream join is exchange-free on both
    sides when bucket counts match. ``sort_cols`` additionally makes
    the join sort-free (SortMergeJoin reads pre-sorted buckets).
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
    return table


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> str:
    """Incremental refresh sink: dynamic partition overwrite — only the
    partitions present in ``df`` are replaced; everything else on disk
    is untouched.

    This is the monthly-release production shape: a new NHS quarter
    lands, the pipeline recomputes that (year, quarter) slice, and the
    sink rewrites one partition instead of 100 TB. Requires partitioned
    layout (see ``write_parquet(partition_by=...)``)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return path


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> str:
    """Training-data export sink: JSON-Lines shards, the interchange
    format LLM data pipelines exchange corpora in.

    Shard membership is *deterministic* (md5-bucket of ``id_col``, the
    same portable bucketing the samplers use), not round-robin: re-runs
    of the export place every document in the same ``shard=k``
    directory, so downstream consumers can diff/refresh shards
    incrementally instead of re-downloading the corpus. One exchange
    (repartition on the shard key) co-locates each shard into one task
    -> one file per shard directory; compression defaults to gzip
    (splittable-at-shard granularity, which is the unit consumers read
    anyway)."""
    from pyspark.sql import functions as F

    from nhs_data_pipeline_spark.llm.dedup import _MD5_H60

    # NULL ids hash via a NUL sentinel: a NULL shard value would route
    # the row to shard=__HIVE_DEFAULT_PARTITION__, OUTSIDE the
    # shard=0..N-1 layout consumers iterate — silent data loss.
    key = f"coalesce(cast({id_col} as string), '\\u0000')"
    shard = F.expr(f"pmod({_MD5_H60.format(x=key)}, {num_shards})")
    w = (
        df.withColumn("shard", shard)
        .repartition(num_shards, "shard")
        # In-shard row order would otherwise be shuffle-fetch order —
        # nondeterministic across runs. Sorting by id makes each
        # shard's CONTENT byte-stable across re-runs (part filenames
        # still embed a per-run UUID), which is what "diff/refresh
        # incrementally" requires, not just stable membership.
        .sortWithinPartitions(id_col)
        .write.mode(mode)
        .partitionBy("shard")
    )
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    return path

"""Content-defined chunking (CDC) for shift-robust span dedup.

``llm/spans.py`` fingerprints every fixed-k token window — exact and
complete, but a single inserted token shifts every downstream window.
CDC (the FastCDC/LBFS family, used by dedup storage systems and by
text-dedup pipelines as a cheaper span signal) instead cuts chunk
boundaries where a *rolling content hash* hits a divisor condition:
boundaries depend only on local content, so an insertion re-chunks
one neighborhood and every other chunk fingerprint survives verbatim.

Spark-first shape (100 TB design)
---------------------------------
- Boundary detection, chunk assembly, and fingerprinting all happen
  IN-PLAN inside one projection per document (array lambdas over the
  token array): no per-token explode, no per-doc window function.
  Only ``(source, chunk_md5, n_tokens)`` rows leave the scan stage —
  the shuffle never carries text (the spans.py rule).
- Duplicate marking is one hash partition on the chunk fingerprint
  (high-cardinality, no skew hot-spot); per-source stats are one
  further map-side-combined aggregate.

Cross-engine determinism
------------------------
The rolling hash is a two-level base-259 / base-1000003 integer
polynomial mod 1e9+7 (pure BIGINT arithmetic, no overflow: acc stays
< 1e9+7 so acc*base + x < 2^63) — engine-portable like the MinHash
shingle encoding (``llm/dedup._poly_shingle_sql``); chunk
fingerprints are md5 of the space-joined chunk. Every decision is
exact integer arithmetic; the one division (duplicate token share)
floor-rounds portably on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm.text import tokenized_frame

# Two-level polynomial parameters, inlined identically into the DuckDB
# oracle (exactly-representable integers; all arithmetic BIGINT-exact).
TOKEN_BASE = 259
WINDOW_BASE = 1000003
MOD = 1000000007


def _token_hash_lambda() -> str:
    """Per-token char polynomial: fold acc*259 + ascii(char) mod MOD.
    Guarded for the empty token (Spark ``sequence(1, 0)`` DESCENDS —
    the fold must never see it)."""
    return (
        "t -> CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT) "
        "ELSE aggregate(sequence(1, length(t)), CAST(0 AS BIGINT), "
        f"(a, i) -> (a * {TOKEN_BASE} + ascii(substring(t, i, 1))) % {MOD}) END"
    )


def cdc_chunk_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
    k: int = 4,
    divisor: int = 8,
) -> DataFrame:
    """``(doc_id, *carry, ch, n_tok)``: one row per content-defined
    chunk, ``ch`` the md5 fingerprint of the space-joined chunk and
    ``n_tok`` its token count. A boundary closes after token ``i``
    (0-based, ``k-1 <= i <= n-2``) when the rolling hash of the
    k-token window ending at ``i`` is divisible by ``divisor``
    (expected chunk length ~``divisor`` tokens); the final chunk
    always closes at ``n-1``. NULL text yields no chunks."""
    toks = tokenized_frame(df, text_col, id_col, carry=carry)
    # Materialize each intermediate array as a real column: interpreted
    # HOF lambdas get no CSE, so inlining __ends into the chunk
    # transform would recompute the whole boundary scan per reference
    # (the build-notes shingle rule).
    d = (
        toks.withColumn("__n", F.size("__w"))
        .filter(F.col("__n") >= 1)
        .withColumn("__th", F.expr(f"transform(__w, {_token_hash_lambda()})"))
    )
    wh = (
        f"aggregate(slice(__th, i - {k} + 2, {k}), CAST(0 AS BIGINT), "
        f"(a, x) -> (a * {WINDOW_BASE} + x) % {MOD})"
    )
    d = d.withColumn(
        "__ends",
        F.expr(
            f"concat(CASE WHEN __n >= {k + 1} THEN "
            f"filter(sequence({k - 1}, __n - 2), i -> {wh} % {divisor} = 0) "
            "ELSE array() END, array(__n - 1))"
        ),
    )
    chunks = (
        "transform(__ends, (e, idx) -> named_struct("
        "'ch', md5(array_join(slice(__w, "
        "CASE WHEN idx = 0 THEN 1 ELSE element_at(__ends, idx) + 2 END, "
        "e - CASE WHEN idx = 0 THEN 0 ELSE element_at(__ends, idx) + 1 END + 1), "
        "' ')), "
        "'n_tok', CAST(e - CASE WHEN idx = 0 THEN 0 "
        "ELSE element_at(__ends, idx) + 1 END + 1 AS BIGINT)))"
    )
    return (
        d.select(
            "doc_id", *[F.col(c) for c in carry], F.explode(F.expr(chunks)).alias("__c")
        )
        .select(
            "doc_id",
            *[F.col(c) for c in carry],
            F.col("__c.ch").alias("ch"),
            F.col("__c.n_tok").alias("n_tok"),
        )
    )


def cdc_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    k: int = 4,
    divisor: int = 8,
) -> DataFrame:
    """Per-source CDC duplicate-chunk report: chunk counts, chunks
    whose fingerprint repeats ANYWHERE in the corpus, and the share of
    tokens sitting in such repeated chunks. One fingerprint-key window
    (hash partition, high-cardinality) + one source-key aggregate."""
    chunks = cdc_chunk_table(
        df, text_col, id_col, carry=(source_col,), k=k, divisor=divisor
    )
    w = Window.partitionBy("ch")
    marked = chunks.withColumn("__cnt", F.count("*").over(w))
    dup = F.col("__cnt") > 1
    return (
        marked.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(dup.cast("bigint")).cast("bigint").alias("dup_chunks"),
            F.sum("n_tok").cast("bigint").alias("chunk_tokens"),
            F.sum(F.when(dup, F.col("n_tok")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("dup_tokens"),
        )
        .withColumn(
            "dup_share",
            F.floor(
                F.col("dup_tokens").cast("double")
                / F.col("chunk_tokens").cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6),
        )
    )

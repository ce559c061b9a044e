"""Span-level (substring) exact deduplication over a document corpus.

Document-level dedup (``llm/dedup.py``) removes whole near-identical
documents; *span-level* dedup finds runs of >= k consecutive tokens
that are repeated verbatim anywhere else in the corpus — the
"ExactSubstr" signal of Lee et al. 2021 (*Deduplicating Training Data
Makes Language Models Better*), which that paper implements with a
suffix array. A distributed suffix array is the wrong tool on Spark;
the same signal falls out of a token-k-gram fingerprint join:

1. tokenize each document (whitespace-normalized),
2. emit every k-token window as ``(doc_id, pos, md5(window))``,
3. a window is *duplicated* iff its fingerprint occurs more than once
   corpus-wide (same doc or another doc),
4. per document, union the duplicated windows' token intervals
   ``[pos, pos+k)`` and report coverage.

Scale design (100 TB)
---------------------
- The only shuffle after tokenization carries ``(fingerprint, doc_id,
  pos)`` — never text. Window strings exist only inside the stage that
  hashes them (project-after-explode, same whole-stage-codegen span).
- Duplicate marking is one hash partition by fingerprint; coverage is
  one window partitioned by ``doc_id``. Both keys are high-cardinality
  (fingerprints near-unique; docs ~uniform), so no skew hot-spots —
  a pathological corpus-wide repeated span lands its *fingerprint*
  group on one reducer, but each group row is ~50 bytes.
- Interval union exploits fixed window length: with positions sorted,
  covered = sum(min(k, next_pos - pos)) — a single ``lead`` window,
  no island re-aggregation pass.
- md5 is used (vs xxhash64) so the fingerprint is engine-portable and
  the whole operator replays as plain SQL in DuckDB for the oracle
  gate. At 128 bits, corpus-scale collision probability is ~0 (a
  64-bit truncation would need a verify pass at 100 TB; md5 does not).

Measured vs a true suffix array (r11): token-level coverage by
duplicated k-windows is mathematically identical to membership in a
verbatim-repeated run of >= k tokens, and
``tools/exactsubstr_ground_truth.py`` verifies the implementation
against an independent suffix-array + Kasai-LCP construction (Lee et
al. §4.1 semantics): recall = precision = 1.0, zero mismatching
documents, on both the sampled-sf1 and the sf0.1 corpora (SCALE.md
r11). The difference vs the paper is the unit (whitespace tokens at
k=8 vs bytes at 50 chars) — definitional, not a miss rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm.text import tokenized_frame


def _token_spans(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """Returns (per-doc token counts, exploded k-token window table).

    The window table has one row per window: ``(id, pos, __h)`` with
    ``pos`` the 0-based token offset and ``__h`` the md5 of the
    space-joined window. Documents shorter than k tokens emit no
    windows (they cannot contain a duplicated span)."""
    # Shared tokenizer (repartitions for the CPU-heavy explode+md5
    # stage: measured 2.8x from a 2-split input at the 10x corpus).
    toks = tokenized_frame(df, text_col, id_col)
    # Blank text splits to [''] (would count as 1 token) and NULL text
    # to a NULL array: both are 0-token documents, matching
    # text.token_count's convention.
    counts = toks.select(
        "doc_id",
        F.when(F.col("__w") == F.array(F.lit("")), F.lit(0))
        .otherwise(F.coalesce(F.size("__w"), F.lit(0)))
        .alias("n_tokens"),
    )
    spans = (
        toks.filter(F.size("__w") >= k)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("__w") - k)).alias("pos"),
            F.col("__w"),
        )
        # Projection runs post-explode inside the same codegen stage:
        # the window string is hashed and dropped before any exchange.
        .select(
            "doc_id",
            "pos",
            F.md5(F.array_join(F.expr(f"slice(__w, pos + 1, {k})"), " ")).alias("__h"),
        )
    )
    return counts, spans


def span_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Per-document duplicated-span statistics.

    Output: one row per input document —
    ``doc_id, n_tokens, dup_spans`` (number of k-token windows whose
    exact text occurs >1 times corpus-wide), ``covered_tokens`` (size
    of the union of those windows' token intervals) and ``dup_ratio``
    (= covered/n_tokens; the fraction of the document that is verbatim
    duplicated text — the quantity Lee et al. threshold on).

    A training pipeline drops or trims documents with high
    ``dup_ratio``; ``span_dedup_stats`` is the (cheap, distributed)
    measurement stage.
    """
    counts, spans = _token_spans(df, text_col, id_col, k)

    wh = Window.partitionBy("__h")
    dup = (
        spans.withColumn("__cnt", F.count("*").over(wh))
        .filter(F.col("__cnt") > 1)
        .select("doc_id", "pos")
    )

    # Fixed-length interval union: contribution of each duplicated
    # window = min(k, gap to the next duplicated window start).
    wd = Window.partitionBy("doc_id").orderBy("pos")
    contrib = F.least(
        F.lit(k), F.coalesce(F.lead("pos").over(wd) - F.col("pos"), F.lit(k))
    )
    per_doc = (
        dup.withColumn("__c", contrib)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("dup_spans"),
            F.sum("__c").alias("covered_tokens"),
        )
    )

    return (
        counts.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_spans", F.lit(0)).cast("bigint").alias("dup_spans"),
            F.coalesce("covered_tokens", F.lit(0))
            .cast("bigint")
            .alias("covered_tokens"),
            # Exact-int operands + one correctly-rounded division:
            # bit-identical across engines, no rounding needed. Empty
            # docs (n_tokens=0) get ratio 0.0, not a 0/0 NaN.
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("covered_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ratio"),
        )
    )


def _rebuild_without(
    df: DataFrame,
    drop_windows: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Shared text-rebuild core for the span removal operators: given
    ``drop_windows`` = ``(doc_id, pos)`` k-token windows to cut,
    return one row per input document with the covered tokens removed.

    Mechanics: explode tokens to ``(doc_id, t, tok)``, LEFT ANTI join
    against the drop windows on ``doc_id AND t BETWEEN pos AND
    pos+k-1`` (doc-local range join — one shuffle keyed by doc_id,
    candidate volume bounded by tokens x windows *per doc*), then
    reassemble order-exactly via sort_array(collect_list(struct)).
    Both stages are bounded by document length — the same bound the
    tokenizer itself carries — and the whole shape replays as plain
    SQL (correlated NOT EXISTS) for the oracle gate.

    Output: ``doc_id, n_tokens, n_removed, cleaned`` (cleaned = kept
    tokens joined with a single space; empty string when everything
    was removed or the doc was empty)."""
    toks = tokenized_frame(df, text_col, id_col)
    counts = toks.select(
        "doc_id",
        F.when(F.col("__w") == F.array(F.lit("")), F.lit(0))
        .otherwise(F.coalesce(F.size("__w"), F.lit(0)))
        .alias("n_tokens"),
    )
    exploded = toks.filter(
        (F.col("__w") != F.array(F.lit(""))) & F.col("__w").isNotNull()
    ).select(
        "doc_id",
        F.posexplode("__w").alias("t", "tok"),
    )
    dw = drop_windows.select(
        F.col("doc_id").alias("__d"), F.col("pos").alias("__p")
    )
    kept = exploded.join(
        dw,
        (exploded["doc_id"] == dw["__d"])
        & (exploded["t"] >= dw["__p"])
        & (exploded["t"] < dw["__p"] + k),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("__n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("t", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("cleaned"),
    )
    return counts.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("n_tokens") - F.coalesce("__n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
    )


def span_dedup_trim(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """The ExactSubstr *action* (Lee et al. 2021 §4.2 keep-one-copy
    remediation, where ``span_dedup_stats`` is the measurement): cut
    every duplicated k-token window occurrence EXCEPT its corpus-wide
    canonical (minimal ``(doc_id, pos)``) occurrence, and return the
    rewritten documents.

    For a verbatim run of length m >= k repeated across documents,
    every window of the run in the minimal document is its own
    fingerprint's canonical, so the first copy survives intact and
    every other copy is removed whole — exactly one copy kept.
    Deterministic from the data alone (no seeds), so the full
    pipeline replays as SQL for the oracle gate.

    Output: ``doc_id, n_tokens, n_removed, cleaned``."""
    _, spans = _token_spans(df, text_col, id_col, k)
    wh = Window.partitionBy("__h")
    redundant = (
        spans.withColumn("__cnt", F.count("*").over(wh))
        .withColumn(
            "__canon", F.min(F.struct("doc_id", "pos")).over(wh)
        )
        .filter(
            (F.col("__cnt") > 1)
            & (F.struct("doc_id", "pos") != F.col("__canon"))
        )
        .select("doc_id", "pos")
    )
    return _rebuild_without(df, redundant, text_col, id_col, k)


def span_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Span-level benchmark decontamination: cut every k-token window
    of the corpus whose exact text occurs anywhere in ``benchmark``
    (a DataFrame with the same ``text_col``) — the span-granular
    complement of the doc-level ``contamination_ngram`` SCORE: this
    one rewrites the training text so benchmark passages cannot leak,
    while keeping the rest of the document (doc-level dropping wastes
    the clean 95% of a lightly-contaminated page).

    The benchmark fingerprint set is aggregated small (distinct md5s)
    and broadcast into the window match — corpus tokens shuffle only
    by doc_id in the rebuild, the contamination probe itself is
    shuffle-free on the corpus side.

    Output: ``doc_id, n_tokens, n_removed, cleaned``."""
    _, spans = _token_spans(df, text_col, id_col, k)
    _, bspans = _token_spans(
        benchmark.select(
            F.col(text_col), F.lit(-1).cast("bigint").alias("__bid")
        ),
        text_col,
        "__bid",
        k,
    )
    bset = bspans.select("__h").distinct()
    hit = spans.join(F.broadcast(bset), "__h").select("doc_id", "pos")
    return _rebuild_without(df, hit, text_col, id_col, k)


def span_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_bucket: int = 64,
) -> DataFrame:
    """Cross-document duplicated-span evidence: for every k-token
    window text shared by >= 2 *distinct* documents, one row per
    unordered document pair sharing it, with the number of shared
    window fingerprints.

    Output: ``id_a < id_b, shared_spans`` — a direct "these two docs
    share verbatim passages" edge list, complementary to MinHash (this
    is exact containment evidence, not whole-doc similarity).

    ``max_bucket`` guards the quadratic within a fingerprint group: a
    boilerplate span occurring in m docs yields m*(m-1)/2 pairs; groups
    larger than ``max_bucket`` distinct docs are dropped (they are
    boilerplate, not duplication evidence — same guardrail philosophy
    as the LSH candidate budget in ``llm/dedup.py``)."""
    _, spans = _token_spans(df, text_col, id_col, k)
    # One row per (fingerprint, doc): within-doc repeats collapse first
    # so the pair fan-out sees distinct docs only.
    per_doc = spans.select("__h", "doc_id").distinct()
    # No self-join at all: the bucket cap bounds each fingerprint group
    # to <= max_bucket docs, so its <= C(max_bucket, 2) pairs explode
    # PLAN-SIDE from the collected (sorted) id list — one pass over
    # the window lineage, nothing persisted, nothing scanned twice.
    # (The earlier banded self-join needed an eager persist to avoid a
    # measured 2.8x double-scan and leaked that cache per call.)
    groups = (
        per_doc.groupBy("__h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("__ids"))
        .filter((F.size("__ids") >= 2) & (F.size("__ids") <= max_bucket))
    )
    pairs = groups.select(
        F.explode(
            F.expr(
                "flatten(transform(__ids, (__a, __i) -> "
                "transform(slice(__ids, __i + 2, size(__ids) - __i - 1), "
                "__b -> struct(__a AS id_a, __b AS id_b))))"
            )
        ).alias("__p")
    )
    return (
        pairs.select("__p.id_a", "__p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_spans"))
    )

"""Sparse text retrieval: inverted index construction + BM25 ranking.

Large-scale training-data pipelines build sparse retrieval structures
over the corpus for deduplication-adjacent tasks (finding the training
documents that match an eval query — contamination forensics), for
RAG-corpus preparation, and for quality auditing ("which documents
does this query surface?"). The two primitives are:

- ``inverted_index``: term -> (corpus frequency, document frequency,
  bounded posting list). The posting list is the retrieval structure;
  df/cf are the statistics BM25 needs.
- ``bm25_topk``: Okapi BM25 (Robertson & Sparck Jones; the public
  Lucene ``k1``/``b`` parameterisation) top-k documents per query, for
  an arbitrary ``(query_id, term)`` query table.

Spark-first shape (100 TB design)
---------------------------------
- Both index statistics and the bounded posting list derive from the
  per-``(term, doc)`` count aggregate. The two consumers RECOMPUTE it
  (one tokenize pass each): column pruning specializes each branch's
  subplan (one keeps ``tf``, the other ``doc_id``), so the canonical
  plans never match and ReuseExchange cannot collapse them — and
  measurement (an explicit shared repartition barrier) showed the
  extra exchange costs more than the second narrow scan saves. This
  is the build-notes rule: prefer narrow recomputes over corpus-sized
  cache pressure; a caller building an index for REPEATED retrieval
  persists ``term_doc_counts`` (the index) once, deliberately.
- Posting lists are BOUNDED before collection: a per-term
  ``row_number`` window caps each list at ``k_postings`` *via
  WindowGroupLimit*, so map tasks pre-trim to the cap and the head
  term ("the", df ~ every document) never materialises an unbounded
  array in one aggregation buffer. An uncapped ``collect_list`` per
  term is the classic 100 TB OOM.
- BM25 scoring joins the (tiny, broadcast) query-term table onto the
  ``(term, doc)`` counts FIRST, so document-frequency and scoring work
  only touch query terms — the corpus-wide token stream is filtered
  down before any further shuffle.
- Corpus scalars (N, avgdl) are one-row aggregates broadcast-nested-
  loop-joined onto the scored stream (the audited scalar-crossJoin
  pattern, tests/test_plans.py whitelist).

Cross-engine determinism
------------------------
``ln`` differs in final ulps between libm implementations, so the IDF
is rounded to 6 decimals per term before use; each per-term BM25
contribution is rounded to 6 decimals; and the per-(query, doc) score
folds contributions in *term order* via the sorted-array ``aggregate``
(DuckDB replays with ``list_reduce(list(... ORDER BY term))``) — the
same bit-reproducible-float discipline as llm/lm.py and llm/dsir.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm.text import explode_terms


def term_doc_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-``(term, doc)`` occurrence counts — the single shuffled
    building block both the index and BM25 derive from."""
    return (
        explode_terms(df, text_col, id_col)
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )


def inverted_index(
    df: DataFrame,
    k_postings: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted index: one row per term with corpus frequency
    (``n_occurrences``), document frequency (``df``), and a bounded
    posting list of the first ``k_postings`` doc ids in ascending
    order (``postings``).

    The cap is enforced *before* collection via a per-term
    ``row_number`` window (WindowGroupLimit pre-trims); the full-stream
    statistics aggregate their own narrow pass over the same counts
    (module docstring: recompute beats a corpus-sized cache here).
    """
    tf = term_doc_counts(df, text_col, id_col)
    stats = tf.groupBy("term").agg(
        F.sum("tf").alias("n_occurrences"),
        F.count("*").alias("df"),
    )
    w = Window.partitionBy("term").orderBy(F.asc(id_col))
    top = (
        tf.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k_postings)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list(id_col)).alias("postings"))
    )
    return stats.join(top, "term")


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 top-``k`` documents per query.

    ``queries`` is a ``(query_id, term)`` table (small — it
    broadcasts). Returns ``(query_id, doc_id, n_terms_hit, score,
    rank)`` with exactly the documents containing at least one query
    term, ranked by the summed per-term BM25 contribution:

        idf(t)  = round(ln(1 + (N - df + 0.5) / (df + 0.5)), 6)
        c(t, d) = round(idf * tf * (k1+1)
                        / (tf + k1 * (1 - b + b * dl/avgdl)), 6)

    folded in term order (bit-reproducible; module docstring). Ties
    break on ``doc_id`` so every engine returns the same k rows.
    """
    # Duplicate (query_id, term) rows would double-count that term's
    # contribution in the fold — dedupe defensively (the table is tiny).
    queries = queries.select("query_id", "term").distinct()
    # callers running SEVERAL rankers over one corpus pass a persisted
    # (term, doc, tf) aggregate via ``tf`` so the tokenizer pass runs
    # once (rrf fusion); by default it derives fresh from ``df``
    if tf is None:
        tf = term_doc_counts(df, text_col, id_col)

    # Everything below derives from the (term, doc, tf) aggregate —
    # document length is sum(tf) per doc (same value as a fresh token
    # count, one less tokenizer definition to drift), and the hits and
    # document frequencies share one broadcast-filtered stream. The tf
    # consumers still each recompute their narrow slice (the module
    # docstring's recompute-over-cache rule); callers scoring MANY
    # query batches against one corpus persist tf themselves.
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    scalars = dl.agg(
        F.count("*").alias("__n"),
        F.sum("dl").alias("__sumdl"),
    )
    qterms = queries.select("term").distinct()
    qhits = tf.join(F.broadcast(qterms), "term")
    hits = qhits.join(F.broadcast(queries), "term")
    dfreq = qhits.groupBy("term").agg(F.count("*").alias("df"))

    avgdl = F.col("__sumdl") / F.col("__n")
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ),
        6,
    )
    contrib = F.round(
        F.col("__idf")
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))),
        6,
    )

    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))  # one-row scalar join (audited)
        .withColumn("__avgdl", avgdl)
        .withColumn("__idf", idf)
        .withColumn("__c", contrib)
    )

    # Deterministic fold of the per-term contributions in term order.
    agg = (
        scored.groupBy("query_id", id_col)
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sort_array(F.collect_list(F.struct("term", "__c"))).alias("__st"),
        )
        .withColumn(
            "score",
            F.expr(
                "aggregate(transform(__st, __s -> __s.__c), "
                "cast(0.0 as double), (__a, __b) -> __a + __b)"
            ),
        )
        .drop("__st")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "n_terms_hit", "score", "rank")
    )


def derived_term_queries(
    df: DataFrame,
    n_queries: int = 3,
    terms_per_query: int = 2,
    skip_top: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic data-derived query set for testing/benchmarks:
    vocabulary ranks ``skip_top+1 .. skip_top + n_queries*terms_per_query``
    by (corpus frequency desc, term), chunked into consecutive
    ``terms_per_query``-term queries (``query_id`` 0-based).

    The head-term skip avoids stopword-like terms; the selection is a
    TakeOrdered over the aggregated vocabulary (never a global sort of
    the token stream), and the result is tiny — callers broadcast it.
    No magnitude-coupled constants: everything derives from the data.
    """
    need = skip_top + n_queries * terms_per_query
    vocab = (
        explode_terms(df, text_col, id_col)
        .groupBy("term")
        .agg(F.count("*").alias("__n"))
        .orderBy(F.desc("__n"), F.asc("term"))
        .limit(need)
    )
    w = Window.orderBy(F.desc("__n"), F.asc("term"))
    return (
        vocab.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > skip_top)
        .withColumn(
            "query_id",
            ((F.col("__rk") - F.lit(skip_top + 1)) / F.lit(terms_per_query)).cast("int"),
        )
        .select("query_id", "term")
    )


def tf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Raw term-frequency top-``k`` per query — the zero-IDF baseline
    ranker (and RRF fusion partner for :func:`bm25_topk`): documents
    ranked by the summed count of query-term occurrences. All-integer
    scoring, so no float discipline anywhere; ties break on doc id.
    ``tf`` injects a shared (term, doc, tf) aggregate as in
    :func:`bm25_topk`."""
    queries = queries.select("query_id", "term").distinct()
    if tf is None:
        tf = term_doc_counts(df, text_col, id_col)
    hits = tf.join(F.broadcast(queries), "term")
    agg = hits.groupBy("query_id", id_col).agg(
        F.sum("tf").cast("bigint").alias("tf_sum")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("tf_sum"), F.asc(id_col))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "tf_sum", "rank")
    )


def rrf_fuse(
    runs: list[DataFrame],
    k0: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of retrieval runs:
    ``score(d) = sum over runs of 1 / (k0 + rank_run(d))``, a document
    absent from a run contributing nothing. Input runs are
    ``(query_id, id_col, rank)`` tables; output is every fused
    candidate with ``(query_id, id_col, rrf_score, rrf_rank)``.

    The per-run terms are single integer-fed double divisions added in
    FIXED run order (a deterministic two-op sequence per run — no
    fold, no rounding needed), so fused scores are bit-identical in
    any engine. Runs full-outer-join on the (query, doc) key — top-k
    run tables are (queries x k)-sized, so the joins are model-sized
    at any corpus scale; rank ties break on the doc id."""
    if len(runs) < 2:
        raise ValueError("rrf_fuse needs at least two runs")
    fused = None
    for i, run in enumerate(runs):
        r = run.select(
            F.col("query_id").alias(f"__q{i}"),
            F.col(id_col).alias(f"__d{i}"),
            F.col("rank").alias(f"__r{i}"),
        )
        if fused is None:
            fused = r.withColumnRenamed("__q0", "__q").withColumnRenamed(
                "__d0", "__d"
            )
            continue
        fused = fused.join(
            r,
            (F.col("__q") == F.col(f"__q{i}")) & (F.col("__d") == F.col(f"__d{i}")),
            "full_outer",
        ).select(
            F.coalesce(F.col("__q"), F.col(f"__q{i}")).alias("__q"),
            F.coalesce(F.col("__d"), F.col(f"__d{i}")).alias("__d"),
            *[F.col(f"__r{j}") for j in range(i + 1)],
        )
    score = None
    for i in range(len(runs)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"__r{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    w = Window.partitionBy("__q").orderBy(F.desc("__s"), F.asc("__d"))
    return (
        fused.withColumn("__s", score)
        .withColumn("rrf_rank", F.row_number().over(w))
        .select(
            F.col("__q").alias("query_id"),
            F.col("__d").alias(id_col),
            F.col("__s").alias("rrf_score"),
            "rrf_rank",
        )
    )


def retrieval_eval(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Ranker-agnostic retrieval quality summary at cutoff ``k``: one
    row ``(n_queries, hit_rate, mrr, ndcg)`` from a ranked run
    (1-based ``rank_col``) and a binary-relevance qrels table
    ``(query_col, id_col)``.

    - ``hit_rate``: fraction of evaluated queries with >= 1 relevant
      doc in the top-k.
    - ``mrr``: mean reciprocal rank of the FIRST relevant hit (0 for
      a miss). Reciprocals are EXACT integers: the contribution is
      ``lcm(1..k) div rank`` (every rank divides the lcm), summed
      exactly, ONE closing division.
    - ``ndcg``: binary-relevance NDCG@k. The ``1/log2(r+1)`` gain for
      each of the k possible ranks is computed ONCE in python and
      inlined as an integer-millionths LITERAL into BOTH plans (the
      seeded-literal pattern) — no engine evaluates a transcendental,
      so no libm-ulp risk. Per query, DCG and ideal-DCG are exact
      integer sums of those literals; the per-query ratio is one IEEE
      division floor-rounded to millionths, the mean is an exact
      integer sum with one division.

    Queries with no qrels row are EXCLUDED (undefined metrics — the
    standard convention); queries with relevant docs but no top-k hit
    score 0 and are included. Scale shape: one broadcast-joinable
    qrels aggregate, one (query, rank) hit aggregate, one scalar
    fold — no windows, no self-joins."""
    import math

    if k < 1:
        raise ValueError("k must be >= 1")
    L = math.lcm(*range(1, k + 1))
    gains = [math.floor(1.0 / math.log2(r + 1) * 1e6 + 0.5) for r in range(1, k + 1)]
    idcg = []
    acc = 0
    for g in gains:
        acc += g
        idcg.append(acc)
    gain_case = "CASE __rnk " + " ".join(
        f"WHEN {r + 1} THEN {g}L" for r, g in enumerate(gains)
    ) + " ELSE 0L END"
    idcg_case = "CASE least(__nrel, {k}) ".format(k=k) + " ".join(
        f"WHEN {i + 1} THEN {v}L" for i, v in enumerate(idcg)
    ) + " END"

    rel = qrels.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__d")
    ).distinct()
    qstats = rel.groupBy("__q").agg(F.count("*").cast("bigint").alias("__nrel"))
    hits = (
        ranked.filter(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("__q"),
            F.col(id_col).alias("__d"),
            F.col(rank_col).cast("int").alias("__rnk"),
        )
        .join(rel, ["__q", "__d"])
    )
    per_hit = hits.groupBy("__q").agg(
        F.min("__rnk").alias("__minr"),
        F.sum(F.expr(gain_case)).cast("bigint").alias("__dcg"),
    )
    perq = (
        qstats.join(per_hit, "__q", "left")
        .select(
            F.when(
                F.col("__minr").isNotNull(),
                F.expr(f"cast({L} as bigint) div __minr"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("__rr"),
            F.when(
                F.col("__dcg").isNotNull(),
                F.floor(
                    F.col("__dcg").cast("double")
                    / F.expr(idcg_case).cast("double")
                    * F.lit(1e6)
                    + F.lit(0.5)
                ).cast("bigint"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("__ndcg_m"),
            (F.col("__minr").isNotNull()).cast("int").alias("__hit"),
        )
    )
    return perq.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        (
            F.floor(
                F.sum("__hit").cast("double")
                / F.count("*").cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("hit_rate"),
        (
            F.floor(
                F.sum("__rr").cast("double")
                / (F.lit(float(L)) * F.count("*").cast("double"))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("mrr"),
        (
            F.floor(
                F.sum("__ndcg_m").cast("double")
                / F.count("*").cast("double")
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("ndcg"),
    )

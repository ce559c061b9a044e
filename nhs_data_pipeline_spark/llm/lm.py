"""Corpus-trained n-gram LM cross-entropy — the "perplexity filter".

CCNet / RefinedWeb-style pipelines score every document by the
perplexity of a language model trained on a trusted reference corpus
and drop (or bucket) the high-perplexity tail. The production variant
uses a pretrained KenLM; this operator implements the same
measurement with an add-1-smoothed *bigram* LM trained on a reference
slice of the corpus itself, entirely in Catalyst expressions — no
model artifact, no Python in the loop:

    p(w2 | w1) = (C(w1 w2) + 1) / (C(w1 ·) + V)
    cross_entropy(doc) = -(1/N_bigrams) * sum ln p(w_i | w_{i-1})

where ``C`` are bigram / bigram-history counts over the reference
slice and ``V`` is the reference vocabulary size + 1 (unseen mass).
Unseen histories degrade to the uniform ``1/V`` — every document gets
a finite score.

Scale design (100 TB)
---------------------
- The LM "table" is two aggregates over the reference slice (bigram
  counts, history counts) joined back onto the corpus bigram stream —
  model fitting and scoring are one plan; refreshing the reference
  slice is just re-running it.
- Shuffles carry (doc_id, pos, short bigram string) and the count
  tables; scoring joins are plain equi-joins Catalyst can broadcast
  when the reference vocabulary is small or shuffle-hash otherwise.
- Determinism: per-bigram log terms are rounded to 4 decimals, and the
  per-doc sum folds in *position order* via a sorted-array aggregate,
  so the resulting double is bit-identical in any engine (same
  discipline as llm/dsir.py — see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm.text import tokenized_frame


def _doc_bigrams(
    df: DataFrame, text_col: str, id_col: str, carry: list[str]
) -> DataFrame:
    """(doc_id, pos, w1, w2) for every adjacent token pair; docs with
    fewer than 2 tokens emit no rows."""
    # Shared tokenizer (split-decoupling repartition; measured 1.3x
    # here -- the bigram stream is cheaper than md5 but still benefits).
    base = tokenized_frame(df, text_col, id_col, tuple(carry))
    return base.filter(F.size("__w") > 1).select(
        "doc_id",
        *carry,
        F.explode(F.sequence(F.lit(1), F.size("__w") - 1)).alias("pos"),
        F.col("__w"),
    ).select(
        "doc_id",
        *carry,
        "pos",
        F.expr("element_at(__w, pos)").alias("w1"),
        F.expr("element_at(__w, pos + 1)").alias("w2"),
    )


def lm_cross_entropy(
    df: DataFrame,
    reference: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram-LM cross-entropy against a reference slice.

    ``reference`` is a boolean Column over ``df`` selecting the
    trusted training slice for the LM. Output: one row per document —
    ``doc_id, n_bigrams, cross_entropy`` (NULL for documents with < 2
    tokens: no bigrams to score). Low cross-entropy = reference-like
    text; the filter thresholds on the high tail."""
    big = _doc_bigrams(
        df.withColumn("__ref", reference), text_col, id_col, carry=["__ref"]
    )

    # The bigram stream would feed four branches (bigram counts,
    # history counts, vocabulary, scoring probe), and their differing
    # shapes defeat exchange reuse — re-tokenizing the corpus per
    # branch (measured 2.7x at the 10x corpus). Persisting the stream
    # fixes one call but leaks a corpus-sized cache per invocation.
    # Instead: ONE pass builds the bigram-count model, everything else
    # (history counts, vocabulary) derives from it, and only that
    # model-sized table is persisted — two tokenization passes total
    # (model + probe), and the leaked cache is model-sized, not
    # corpus-sized.
    ref_big = big.filter(F.col("__ref"))
    # localCheckpoint, not persist (r12): a leaked persist of the
    # model table rewrites the NEXT call's plans over InMemoryRelation
    # and recompiles every downstream codegen unit (the
    # curate.audit_panel compile-storm root cause); the checkpointed
    # table keeps one stable plan shape and releases via the
    # ContextCleaner.
    cb = (
        ref_big.groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
        .localCheckpoint(eager=True)
    )
    cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
    # Vocabulary: distinct tokens in the reference slice (+1 unseen
    # mass). Every token of every >=2-token doc appears as the w1 or
    # w2 of some bigram, so the model's key set covers all positions.
    vocab = cb.select(F.col("w1").alias("tok")).union(
        cb.select(F.col("w2").alias("tok"))
    )
    vsz = vocab.agg((F.count_distinct("tok") + 1).alias("__V"))

    # explicit broadcast hints on the model-sized sides: cb/cu carry
    # no stats after the checkpoint (the r8 per-callsite rule)
    terms = (
        big.join(F.broadcast(cb), ["w1", "w2"], "left")
        .join(F.broadcast(cu), "w1", "left")
        .crossJoin(F.broadcast(vsz))
        .select(
            "doc_id",
            "pos",
            F.round(
                F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("__V"))
                ),
                4,
            ).alias("term"),
        )
    )

    scored = (
        terms.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sort_array(F.collect_list(F.struct("pos", "term"))).alias("__st"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                -F.expr(
                    "aggregate(transform(__st, __s -> __s.term), "
                    "cast(0.0 as double), (__a, __x) -> __a + __x)"
                )
                / F.col("n_bigrams")
            ).alias("cross_entropy"),
        )
    )

    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        "cross_entropy",
    )


def lm_cross_entropy_kn(
    df: DataFrame,
    reference: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under an absolute-discount
    KNESER-NEY bigram LM (D = 3/4) trained on a reference slice — the
    smoothing the production perplexity filters (KenLM) actually use,
    next to :func:`lm_cross_entropy`'s add-1 baseline. KN's insight:
    back off not to unigram FREQUENCY but to continuation COUNT (how
    many distinct histories a word follows) — "Francisco" is frequent
    but follows only "San", so it gets almost no backoff mass.

        p_cont(w2)  = (N1+(.w2) + 1) / (NT + V)          [add-1 so
                       unseen words keep nonzero mass]
        p(w2|w1)    = (max(C(w1w2) - D, 0)
                       + D * N1+(w1.) * p_cont(w2)) / C(w1.)
        unseen w1   -> p_cont(w2)

    with N1+(w1.) = distinct continuations of w1, N1+(.w2) = distinct
    histories of w2, NT = distinct bigram types, V = vocabulary + 1.
    D = 0.75 is exactly representable in binary, every count is an
    exact integer, and the assembled probability is one identically-
    spelled IEEE sequence in both engines; the per-bigram ln rounds to
    4 decimals before the position-ordered fold (the module's
    bit-reproducibility discipline).

    Scale shape: identical to :func:`lm_cross_entropy` — ONE
    bigram-count aggregate is the model; history totals, continuation
    counts, history fan-outs, NT and V all derive from that
    model-sized table (persisted once); the corpus is tokenized twice
    (model + probe), never more."""
    big = _doc_bigrams(
        df.withColumn("__ref", reference), text_col, id_col, carry=["__ref"]
    )
    ref_big = big.filter(F.col("__ref"))
    # localCheckpoint, not persist: see lm_cross_entropy (r12).
    cb = (
        ref_big.groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
        .localCheckpoint(eager=True)
    )
    cu = cb.groupBy("w1").agg(
        F.sum("cb").alias("cu"), F.count("*").alias("n1f")
    )
    nh = cb.groupBy("w2").agg(F.count("*").alias("nh"))
    vocab = cb.select(F.col("w1").alias("tok")).union(
        cb.select(F.col("w2").alias("tok"))
    )
    consts = vocab.agg(
        (F.count_distinct("tok") + 1).alias("__V")
    ).crossJoin(F.broadcast(cb.agg(F.count("*").alias("__NT"))))

    d_lit = F.lit(0.75)
    pcont = (
        (F.coalesce(F.col("nh"), F.lit(0)) + F.lit(1.0))
        / (F.col("__NT") + F.col("__V")).cast("double")
    )
    seen = (
        F.greatest(
            F.coalesce(F.col("cb"), F.lit(0)).cast("double") - d_lit,
            F.lit(0.0),
        )
        + d_lit * F.col("n1f").cast("double") * pcont
    ) / F.col("cu").cast("double")
    # explicit broadcast hints on the model-sized sides: cu/nh derive
    # from the persisted cb and carry no stats, so Catalyst falls back
    # to SortMergeJoin without them (the r8 per-callsite broadcast
    # rule; the registry plan scan enforces it)
    terms = (
        big.join(F.broadcast(cb), ["w1", "w2"], "left")
        .join(F.broadcast(cu), "w1", "left")
        .join(F.broadcast(nh), "w2", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "pos",
            F.round(
                F.log(F.when(F.col("cu").isNull(), pcont).otherwise(seen)),
                4,
            ).alias("term"),
        )
    )
    scored = (
        terms.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sort_array(F.collect_list(F.struct("pos", "term"))).alias("__st"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                -F.expr(
                    "aggregate(transform(__st, __s -> __s.term), "
                    "cast(0.0 as double), (__a, __x) -> __a + __x)"
                )
                / F.col("n_bigrams")
            ).alias("cross_entropy_kn"),
        )
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        "cross_entropy_kn",
    )


def loo_source_cross_entropy(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source LEAVE-ONE-OUT cross-entropy: score every source's
    bigrams under the add-1 bigram LM trained on ALL OTHER SOURCES —
    the mixture diagnostic that ranks "which source looks least like
    the rest of the corpus" (high LOO CE = distributional outlier:
    candidate for re-weighting, re-cleaning, or exclusion). One row
    per source: ``(source, n_bigrams, loo_cross_entropy)``.

    The distributed trick: train nothing per source. The LOO counts
    are SUBTRACTIONS — ``C_loo(s) = C_total - C_s`` for bigram counts,
    history counts, and vocabulary (a token leaves source s's LOO
    vocabulary only if s is the ONLY source containing it), so ONE
    pass builds the total model + per-source deltas and every LOO
    model materializes implicitly at probe time. A per-source retrain
    would scan the corpus n_sources times; this scans it ONCE: the
    probe itself runs on the (source, w1, w2) count model weighted by
    its own counts (r11 — the per-occurrence term depends only on
    that key, so per-source sums are sum(count * term)), independent
    of the source count.

    Determinism: the per-bigram ``ln p`` quantizes to INTEGER
    ten-thousandths via the portable floor-round (three IEEE ops,
    identically spelled in both engines) immediately after the
    transcendental, so the per-source sums are order-free exact
    integer additions — no fold, no collect_list. The final mean
    floor-rounds to 6 dp. A single-source corpus degenerates to
    p = 1 (empty LOO model, V_loo = 0) — defined, documented.

    NULL sources form their own group and survive every probe join:
    the internal source key is chr(0)-sentinel-coalesced (a plain
    equi-join on a NULL key silently drops the rows — the NULL-key
    rule) and restored to NULL at output."""
    big = _doc_bigrams(
        df.withColumn(
            "__src",
            F.coalesce(F.col(source_col).cast("string"), F.lit("\x00")),
        ),
        text_col,
        id_col,
        carry=["__src"],
    )
    # total + per-source bigram/history counts, all from one stream
    cbs = big.groupBy("__src", "w1", "w2").agg(
        F.count("*").alias("cbs")
    ).persist()
    cbs.count()
    # r11: the total/history count tables are WINDOW aggregates over
    # cbs, not separate groupBy branches — the previous shape built
    # three vocabulary-sized broadcast tables (a driver collect + a
    # broadcast build each) just to join them back onto cbs itself.
    # As windows they share cbs's single exchange (all three partition
    # sets contain w1, so one hash(w1) repartition satisfies every
    # clustering) and, because every cbs row belongs to its own
    # window group, the old left-join coalesce(NULL, 0) paths were
    # unreachable — counts are identical integers.
    from pyspark.sql import Window as _W
    # vocabulary deltas: a token drops out of source s's LOO vocab iff
    # s is the only source containing it
    tok_src = (
        cbs.select("__src", F.col("w1").alias("tok"))
        .union(cbs.select("__src", F.col("w2").alias("tok")))
        .distinct()
    )
    tok_stats = tok_src.groupBy("tok").agg(
        F.count("*").alias("__ns"), F.min("__src").alias("__one")
    )
    # r11b (guide §5.4 stage-count discipline): ONE aggregate buckets
    # tokens by "the source they are exclusive to" (NULL = shared by
    # several sources); the vocabulary total is its sum and the
    # per-source singleton counts are its non-NULL rows — replacing
    # three separate model-sized stages (d_total aggregate, only_s
    # aggregate, a srcs-distinct + vloo join) with one aggregate, one
    # 2-6-row sum, and an inline subtraction at probe time. Integer
    # counts identical; the oracle is untouched.
    sing = tok_stats.groupBy(
        F.when(F.col("__ns") == 1, F.col("__one")).alias("__src")
    ).agg(F.count("*").cast("bigint").alias("__only"))
    d_total = sing.agg(F.sum("__only").cast("bigint").alias("__dt"))
    only_s = sing.filter(F.col("__src").isNotNull())
    z = F.lit(0)
    vloo_val = F.col("__dt") - F.coalesce(F.col("__only"), F.lit(0))
    p = (
        (
            F.coalesce(F.col("cbt"), z) - F.coalesce(F.col("cbs"), z)
            + F.lit(1.0)
        )
        / (
            F.coalesce(F.col("cut"), z) - F.coalesce(F.col("cus"), z)
            + vloo_val + F.lit(1)
        ).cast("double")
    )
    # Probe the MODEL, not the corpus (r11 optimization): the per-
    # occurrence term depends only on (__src, w1, w2), and cbs already
    # holds the occurrence count per such key — so scoring is a join
    # over the model-sized count table weighted by cbs, and the
    # per-source sums are sum(cbs * term) / sum(cbs). Integer-exact
    # identical to the old per-occurrence probe (same multiset of
    # integer ten-thousandth terms, order-free addition), but the
    # SECOND corpus tokenize+explode pass disappears: one scan total,
    # still independent of the source count. Measured 4.9 s -> see
    # OPTIMIZATION_r11.md.
    terms = (
        cbs.repartition(F.col("w1"))
        .select(
            "__src",
            "w1",
            "w2",
            "cbs",
            F.sum("cbs").over(_W.partitionBy("w1", "w2")).alias("cbt"),
            F.sum("cbs").over(_W.partitionBy("__src", "w1")).alias("cus"),
            F.sum("cbs").over(_W.partitionBy("w1")).alias("cut"),
        )
        .join(F.broadcast(only_s), "__src", "left")
        .crossJoin(F.broadcast(d_total))
        .select(
            "__src",
            F.col("cbs").alias("__cnt"),
            F.floor(F.log(p) * F.lit(1e4) + F.lit(0.5))
            .cast("bigint")
            .alias("__tm"),
        )
    )
    out = (
        terms.groupBy("__src")
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("__cnt") * F.col("__tm")).alias("__s"),
        )
        .select(
            F.when(F.col("__src") == "\x00", F.lit(None))
            .otherwise(F.col("__src"))
            .alias(source_col),
            "n_bigrams",
            (
                F.floor(
                    -F.col("__s").cast("double")
                    / (F.col("n_bigrams").cast("double") * F.lit(1e4))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("loo_cross_entropy"),
        )
        .localCheckpoint(eager=False)
    )
    out.count()
    cbs.unpersist()
    return out

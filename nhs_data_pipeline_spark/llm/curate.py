"""Corpus curation driver: the all-signal audit panel as a reusable
operator (see queries.curate_audit_panel for the oracle-checked
instantiation and threshold provenance)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm import dsir, lm
from nhs_data_pipeline_spark.llm import spans as sp
from nhs_data_pipeline_spark.llm import text as tx


def audit_panel(
    df: DataFrame,
    lm_reference: Column,
    dsir_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[str, float] | None = None,
    vocab_k: int = 25,
    span_k: int = 8,
) -> DataFrame:
    """Per-document curation report card: quality, trigram repetition,
    span-duplication coverage, bigram-LM cross-entropy vs
    ``lm_reference``, DSIR importance vs ``dsir_target``, OOV rate vs
    the corpus top-``vocab_k`` vocabulary — plus a ``keep`` decision
    from ``thresholds`` (keys: quality_min, dup3_max, span_dup_max,
    oov_max, lm_ce_max). Missing signals (e.g. CE on a 1-token doc)
    fail closed: ``keep`` is false, never NULL.

    The DEFAULT thresholds were calibrated on the synthetic gate
    corpus (~50-token docs over a tiny vocabulary). On natural text,
    tune them — in particular ``oov_max`` against a realistic
    ``vocab_k``: a top-25 vocabulary covers only ~30% of natural
    tokens (Zipf), so the default oov_max=0.25 would reject nearly
    everything; the curate CLI exposes every threshold as a flag."""
    defaults = {
        "quality_min": 0.4,
        "dup3_max": 0.05,
        "span_dup_max": 0.5,
        "oov_max": 0.25,
        "lm_ce_max": 3.7,
    }
    unknown = set(thresholds or {}) - set(defaults)
    if unknown:
        raise ValueError(
            f"unknown threshold keys {sorted(unknown)}; "
            f"valid: {sorted(defaults)}"
        )
    th = {**defaults, **(thresholds or {})}
    # The six signal subplans each rescan the input; materialize it
    # once so e.g. a JSONL corpus is parsed once, not per signal.
    # localCheckpoint, NOT persist (r12): a leaked persist registers
    # the input plan in the CacheManager, so the NEXT call's signal
    # subplans get silently rewritten over InMemoryRelation — a
    # different plan shape whose giant fused codegen units all
    # recompile (measured: rep1 13.0 s, rep2 134.1 s of near-pure
    # Janino; jstack showed 28/32 executor threads blocked on the
    # codegen KeyLock). A checkpointed input pins every call to the
    # same Scan ExistingRDD shape (identical generated code, compiled
    # once per JVM) and the blocks release via the ContextCleaner when
    # the panel's refs drop — no cross-call cache mutation at all.
    # Measured (5 reps, calm host, 32c): min 14.6 s / median 16.6 s
    # before, ~4.4-6 s steady after.
    df = df.localCheckpoint(eager=True)
    prof = df.select(
        F.col(id_col).alias("doc_id"),
        tx.token_count(text_col).alias("n_tokens"),
        tx.quality_score(text_col).alias("quality"),
    )
    rep = tx.repetition_metrics(
        df, text_col=text_col, id_col=id_col, ns=(3,)
    ).select(F.col(id_col).alias("doc_id"), "dup3_frac")
    spans_df = sp.span_dedup_stats(df, text_col, id_col, k=span_k).select(
        "doc_id", F.col("dup_ratio").alias("span_dup_ratio")
    )
    ce = lm.lm_cross_entropy(df, lm_reference, text_col, id_col).select(
        "doc_id", F.col("cross_entropy").alias("lm_ce")
    )
    ds = dsir.dsir_scores(df, dsir_target, text_col, id_col).select(
        "doc_id", "dsir_score"
    )
    oov = tx.oov_stats(
        df, tx.top_terms(df, k=vocab_k, text_col=text_col, id_col=id_col).select("term"),
        text_col=text_col, id_col=id_col,
    ).select(F.col(id_col).alias("doc_id"), "oov_frac")
    # r11: the signal subplans inherit hash(doc_id) partitioning from
    # the shared tokenizer exchange, so without a boundary here the
    # six-way join would inline every signal's full pipeline into one
    # mega-stage (no per-signal materialization, branch recompute of
    # the shared lineage) — measured 4.1 s -> 10.1 s on the composed
    # panel. An explicit exchange per signal output restores the
    # per-signal stage boundaries (tiny per-doc rows; scale-safe).
    par = df.sparkSession.sparkContext.defaultParallelism
    bound = lambda f: f.repartition(par, F.col("doc_id"))  # noqa: E731
    panel = (
        prof.join(bound(rep), "doc_id", "left")
        .join(bound(spans_df), "doc_id", "left")
        .join(bound(ce), "doc_id", "left")
        .join(bound(ds), "doc_id", "left")
        .join(bound(oov), "doc_id", "left")
    )
    keep = F.coalesce(
        (F.col("quality") >= th["quality_min"])
        & (F.col("dup3_frac") <= th["dup3_max"])
        & (F.col("span_dup_ratio") <= th["span_dup_max"])
        & (F.col("oov_frac") <= th["oov_max"])
        & (F.col("lm_ce") <= th["lm_ce_max"]),
        F.lit(False),
    )
    return panel.select(
        "doc_id",
        "n_tokens",
        "quality",
        "dup3_frac",
        "span_dup_ratio",
        "lm_ce",
        "dsir_score",
        "oov_frac",
        keep.alias("keep"),
    )

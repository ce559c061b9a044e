"""10x scale rehearsal of the exact-Jaccard / LSH candidate-volume
cost models (r08, VERDICT ask #3).

The dispatcher's crossover factor (llm/dedup._JACCARD_PREFIX_COST_FACTOR)
and the LSH flood risk were calibrated at sf0.1 (5,000 docs). This tool
rebuilds the evidence at 10x on two corpus shapes and prints a JSON
summary for SCALE.md:

1. ``repl10`` — the r04 adversarial harness: every sf0.1 document
   replicated 10x with a distinct suffix (50,000 docs, dense shared
   vocabulary, df x10). The countjoin volume law is quadratic in df,
   so predicted cj_pairs must land ~100x the sf0.1 number; the
   dispatcher must still pick the cheaper mode; minhash_lsh_pairs'
   candidate volume must track duplication structure (~ docs x 9 / 2),
   not n^2.
2. ``zipf50k`` — a deterministic 50,000-doc corpus over a Zipfian
   30k-word vocabulary (the REAL-corpus shape: most bigrams rare).
   pf_pairs must collapse far below cj_pairs, auto must dispatch to
   prefix, and the measured actual prefix-candidate join volume must
   respect the pf_pairs upper bound.

Heavy steps (the repl10 chosen-mode join) are skipped with
``--skip-heavy``; everything else is aggregates-only or sparse-side
fast.

Usage: python tools/scale_rehearsal.py [--skip-heavy] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _repl10(spark, sf_dir: str) -> DataFrame:
    """sf0.1 documents x10: each replica appends a distinct two-word
    suffix (near-dup cliques of 10; body bigrams shared, df x10)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    r = spark.range(10).select(F.col("id").alias("__r"))
    return d.crossJoin(r).select(
        (F.col("doc_id") * 10 + F.col("__r")).alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit(" replsuffix"),
            F.col("__r").cast("string"),
            F.lit(" tail"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )


def _zipf50k(spark, n_docs: int = 50_000, vocab: int = 30_000) -> DataFrame:
    """Deterministic Zipfian corpus: doc i has 60 + (h(i) % 61) words,
    each word rank = floor(vocab^u) with u uniform from md5(doc, pos)
    — pmf ~ 1/rank (inverse-CDF of Zipf s=1). Pure plan-side exprs,
    no Python RNG, reproducible across runs/partitionings."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    length = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                          F.lit(":len"))), 1, 8), 16, 10)
        .cast("bigint") % 61 + 60
    )
    word = (
        "concat('w', cast(pow(%d, (cast(conv(substring(md5(concat("
        "cast(doc_id as string), ':', cast(p as string))), 1, 8), 16, 10)"
        " as double) / 4294967296.0)) as bigint))" % vocab
    )
    return base.withColumn("__len", length).select(
        "doc_id",
        F.expr(
            "array_join(transform(sequence(1, cast(__len as int)), "
            f"p -> {word}), ' ')"
        ).alias("text"),
    )


def _prefix_candidate_volume(df: DataFrame, threshold: float) -> int:
    """ACTUAL prefix-mode candidate join volume (rows of the prefix
    self-join before length/positional filters and verification) —
    the quantity pf_pairs upper-bounds."""
    from fractions import Fraction

    from pyspark.sql import Window

    from nhs_data_pipeline_spark.llm.dedup import _bigram_tokens

    fr = Fraction(str(threshold))
    num, den = fr.numerator, fr.denominator
    toks = _bigram_tokens(df, "text", "doc_id")
    sz = toks.groupBy("doc_id").agg(F.count("*").alias("__sz"))
    freq = toks.groupBy("bg").agg(F.count("*").alias("__n"))
    prefix = (
        toks.join(freq, "bg")
        .join(sz, "doc_id")
        .withColumn(
            "__p",
            F.col("__sz")
            - F.expr(f"({num} * __sz + {den} - 1) div {den}")
            + F.lit(1),
        )
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("__n"), F.asc("bg"))
            ),
        )
        .filter(F.col("__rk") <= F.col("__p"))
        .select("doc_id", "bg")
        .persist()
    )
    prefix.count()
    a = prefix.select(F.col("doc_id").alias("id_a"), "bg")
    b = prefix.select(F.col("doc_id").alias("id_b"), "bg")
    n = (
        a.join(b, "bg")
        .filter(F.col("id_a") < F.col("id_b"))
        .count()
    )
    prefix.unpersist()
    return n


def main() -> int:
    skip_heavy = "--skip-heavy" in sys.argv
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from nhs_data_pipeline_spark.llm import dedup as dd
    from nhs_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale_rehearsal")
    sf_dir = "/root/testdata/sf0.1"
    summary: dict = {"sf_dir": sf_dir, "threshold": 0.6}

    # ---- corpus 1: adversarial dense (sf0.1 x10 near-dup cliques)
    repl = _repl10(spark, sf_dir).persist()
    n_repl = repl.count()
    t0 = time.time()
    est_r = dd.estimate_jaccard_join_modes(repl, 0.6)
    est_secs = time.time() - t0
    choose_prefix = (
        est_r["pf_pairs"] * dd._JACCARD_PREFIX_COST_FACTOR < est_r["cj_pairs"]
    )
    summary["repl10"] = {
        "docs": n_repl,
        "estimate": est_r,
        "estimate_secs": round(est_secs, 1),
        "dispatch": "prefix" if choose_prefix else "countjoin",
    }

    # LSH candidate volume on the self-similar corpus (flood check)
    t0 = time.time()
    n_lsh = dd.minhash_lsh_pairs(repl, hash_fn="portable").count()
    summary["repl10"]["lsh_pairs"] = n_lsh
    summary["repl10"]["lsh_secs"] = round(time.time() - t0, 1)
    summary["repl10"]["true_clique_pairs"] = (n_repl // 10) * 45

    if not skip_heavy:
        report: dict = {}
        t0 = time.time()
        n_pairs = dd.exact_jaccard_join(
            repl, 0.6, mode="auto", report=report
        ).count()
        summary["repl10"]["auto_mode"] = report["mode"]
        summary["repl10"]["auto_secs"] = round(time.time() - t0, 1)
        summary["repl10"]["result_pairs"] = n_pairs
    repl.unpersist()

    # ---- corpus 2: realistic sparse (Zipfian vocabulary)
    zipf = _zipf50k(spark).persist()
    n_zipf = zipf.count()
    est_z = dd.estimate_jaccard_join_modes(zipf, 0.6)
    choose_prefix_z = (
        est_z["pf_pairs"] * dd._JACCARD_PREFIX_COST_FACTOR < est_z["cj_pairs"]
    )
    summary["zipf50k"] = {
        "docs": n_zipf,
        "estimate": est_z,
        "dispatch": "prefix" if choose_prefix_z else "countjoin",
    }
    actual_pf = _prefix_candidate_volume(zipf, 0.6)
    summary["zipf50k"]["actual_prefix_candidates"] = actual_pf
    # pf_pairs is an ordering signal, not a bound (it can under- or
    # over-shoot the per-doc prefix choice); what must hold is that
    # the actual volume stays orders of magnitude below cj_pairs
    summary["zipf50k"]["actual_vs_cj_ratio"] = (
        actual_pf / est_z["cj_pairs"] if est_z["cj_pairs"] else None
    )

    # run BOTH modes on the sparse corpus (both tractable there) and
    # check the dispatcher picked the faster wall
    t0 = time.time()
    n_pf = dd.exact_jaccard_join(zipf, 0.6, mode="prefix").count()
    pf_secs = time.time() - t0
    t0 = time.time()
    n_cj = dd.exact_jaccard_join(zipf, 0.6, mode="countjoin").count()
    cj_secs = time.time() - t0
    summary["zipf50k"].update(
        {
            "prefix_secs": round(pf_secs, 1),
            "countjoin_secs": round(cj_secs, 1),
            "modes_agree": n_pf == n_cj,
            "result_pairs": n_pf,
            "dispatcher_picked_faster": (
                (pf_secs <= cj_secs) == choose_prefix_z
                or abs(pf_secs - cj_secs) < 1.0
            ),
        }
    )
    zipf.unpersist()

    line = json.dumps(summary)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

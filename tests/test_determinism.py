"""Partitioning-invariance of the bit-reproducible float operators.

The engine claims dsir_scores, lm_cross_entropy, and zscore_outliers
produce BIT-identical doubles regardless of physical partitioning
(the deterministic-fold / exact-integer-moment designs). These tests
run each operator under adversarially different repartitionings and
require exact equality — any accidental reintroduction of an
order-sensitive float sum fails here before it reaches the oracle
gate.
"""

import random

from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm import dsir, lm
from nhs_data_pipeline_spark.llm import spans as sp
from nhs_data_pipeline_spark.ops.analytics import zscore_outliers

WORDS = ["alpha", "beta", "gamma", "delta", "omega", "psi", "chi", "mu"]


def _corpus(spark, n=60, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 30))),
         f"src{i % 3}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _variants(df, key="source"):
    return [df.repartition(1), df.repartition(13, key), df.repartition(32)]


def test_dsir_scores_partitioning_invariant(spark):
    base = _corpus(spark)
    outs = [
        {
            r["doc_id"]: r["dsir_score"]
            for r in dsir.dsir_scores(v, F.col("source") == "src0", buckets=64).collect()
        }
        for v in _variants(base)
    ]
    assert outs[0] == outs[1] == outs[2]  # exact float equality


def test_lm_cross_entropy_partitioning_invariant(spark):
    base = _corpus(spark)
    outs = [
        {
            r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
            for r in lm.lm_cross_entropy(v, F.col("source") == "src1").collect()
        }
        for v in _variants(base)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_zscore_partitioning_invariant(spark):
    rng = random.Random(11)
    rows = [
        (i, f"g{i % 2}", round(rng.uniform(0, 20), 2)) for i in range(400)
    ] + [(400, "g0", 500.0), (401, "g1", 500.0)]
    df = spark.createDataFrame(rows, "event_id long, grp string, value double")
    outs = [
        {
            r["event_id"]: r["zscore"]
            for r in zscore_outliers(v, "value", ["grp"], threshold=3.0).collect()
        }
        for v in _variants(df, key="grp")
    ]
    assert outs[0] == outs[1] == outs[2]
    assert {400, 401} <= set(outs[0])


def test_span_stats_brute_force_property(spark):
    """span_dedup_stats vs a quadratic python reference on a random
    corpus with planted repeats."""
    rng = random.Random(3)
    rows = []
    for i in range(25):
        toks = [rng.choice(WORDS) for _ in range(rng.randint(1, 20))]
        rows.append((i, " ".join(toks)))
    # Planted: two docs sharing an 8-token run at different offsets.
    shared = [rng.choice(WORDS) for _ in range(8)]
    rows.append((100, " ".join(["x1", "x2"] + shared)))
    rows.append((101, " ".join(shared + ["y1"])))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    k = 4
    # Quadratic reference: exact window multiset over all docs.
    from collections import Counter

    windows = Counter()
    per_doc = {}
    for i, text in rows:
        w = " ".join(text.split()).split(" ")
        spans_ = [tuple(w[j:j + k]) for j in range(len(w) - k + 1)] if len(w) >= k else []
        per_doc[i] = (len(w), spans_)
        windows.update(spans_)
    want = {}
    for i, (n, spans_) in per_doc.items():
        dup_pos = [j for j, s in enumerate(spans_) if windows[s] > 1]
        covered = 0
        for a, b in zip(dup_pos, dup_pos[1:] + [None]):
            covered += k if b is None else min(k, b - a)
        want[i] = (n, len(dup_pos), covered)

    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["covered_tokens"])
        for r in sp.span_dedup_stats(df, k=k).collect()
    }
    assert got == want

"""Content-defined chunking (llm/cdc.py): chunk-cover invariants,
the shift-robustness property that motivates CDC over fixed-k
windows, degenerate documents, and partitioning invariance."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm import cdc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _long_text(seed, n=400):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(50)]
    return " ".join(rng.choice(vocab) for _ in range(n))


def test_cdc_chunks_cover_document_exactly(spark):
    text = _long_text(1)
    t = cdc.cdc_chunk_table(_docs(spark, [(1, text)]))
    rows = t.collect()
    assert sum(r.n_tok for r in rows) == len(text.split(" "))
    assert len(rows) > 10  # divisor 8 on 400 tokens must actually cut


def test_cdc_insertion_shifts_only_one_neighborhood(spark):
    # THE CDC property: insert one token near the front of a long doc;
    # all chunks outside the edited neighborhood keep their
    # fingerprints (a fixed-k window table would lose every window
    # after the edit point)
    words = _long_text(2).split(" ")
    edited = " ".join(words[:7] + ["INSERTED"] + words[7:])
    t = cdc.cdc_chunk_table(
        _docs(spark, [(1, " ".join(words)), (2, edited)])
    )
    by_doc = {1: set(), 2: set()}
    for r in t.collect():
        by_doc[r.doc_id].add(r.ch)
    shared = by_doc[1] & by_doc[2]
    assert len(shared) >= 0.8 * len(by_doc[1])


def test_cdc_degenerate_docs(spark):
    t = cdc.cdc_chunk_table(
        _docs(spark, [(1, None), (2, ""), (3, "one"), (4, "a b c")])
    )
    rows = sorted((r.doc_id, r.n_tok) for r in t.collect())
    # NULL -> no chunks; '' -> one 1-token chunk (the '' token, the
    # spans.py convention); short docs -> a single chunk
    assert rows == [(2, 1), (3, 1), (4, 3)]


def test_cdc_stats_duplicate_marking(spark):
    # identical docs in different sources: every chunk repeats
    text = _long_text(3)
    # source c draws from a DISJOINT vocabulary: same-vocab random text
    # genuinely shares short chunks (observed), which is correct
    # behavior but not what this test isolates
    rng = random.Random(4)
    other = " ".join(f"x{rng.randrange(50)}" for _ in range(400))
    docs = spark.createDataFrame(
        [(1, text, "a"), (2, text, "b"), (3, other, "c")],
        "doc_id bigint, text string, source string",
    )
    out = {r.source: r for r in cdc.cdc_dedup_stats(docs).collect()}
    assert out["a"].dup_share == 1.0 and out["b"].dup_share == 1.0
    assert out["c"].dup_chunks == 0 and out["c"].dup_share == 0.0


def test_cdc_partitioning_invariance(spark):
    docs = _docs(spark, [(i, _long_text(i)) for i in range(12)])
    one = sorted(
        (r.doc_id, r.ch, r.n_tok) for r in cdc.cdc_chunk_table(docs).collect()
    )
    two = sorted(
        (r.doc_id, r.ch, r.n_tok)
        for r in cdc.cdc_chunk_table(docs.repartition(5)).collect()
    )
    assert one == two and one

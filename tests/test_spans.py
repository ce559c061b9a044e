"""Span-level exact-substring dedup (llm/spans.py)."""

from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm import spans as sp


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stats(spark, rows, k=8):
    out = sp.span_dedup_stats(_docs(spark, rows), "text", "doc_id", k=k)
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_spans"],
            r["covered_tokens"],
            r["dup_ratio"],
        )
        for r in out.collect()
    }


def test_cross_doc_shared_window(spark):
    got = _stats(
        spark,
        [
            (1, "a b c d e f g h i j"),
            (2, "x x a b c d e f g h z"),
            (3, "p1 p2 p3 p4 p5 p6 p7 p8 p9"),
        ],
    )
    # "a b c d e f g h" occurs in doc 1 (pos 0) and doc 2 (pos 2).
    assert got[1] == (10, 1, 8, 0.8)
    assert got[2] == (11, 1, 8, 8 / 11)
    assert got[3] == (9, 0, 0, 0.0)


def test_within_doc_repeat_counts_as_duplicated(spark):
    # The 8-token phrase repeats inside ONE doc: both occurrences are
    # duplicated spans; adjacent intervals [0,8) and [8,16) union to 16.
    got = _stats(spark, [(1, "p q r s t u v w p q r s t u v w")])
    assert got[1] == (16, 2, 16, 1.0)


def test_overlapping_windows_union_not_sum(spark):
    # A shared 9-token run yields two overlapping windows (pos 0 and 1)
    # covering 9 tokens, not 16.
    got = _stats(
        spark,
        [(5, "m n o p q r s t u"), (6, "z m n o p q r s t u")],
    )
    assert got[5] == (9, 2, 9, 1.0)
    assert got[6] == (10, 2, 9, 0.9)


def test_short_docs_emit_no_spans(spark):
    got = _stats(spark, [(1, "a b c"), (2, "a b c")], k=8)
    # Identical docs but shorter than k: no windows, no duplication.
    assert got[1] == (3, 0, 0, 0.0)
    assert got[2] == (3, 0, 0, 0.0)


def test_blank_and_null_docs_are_zero_token(spark):
    got = _stats(
        spark,
        [(1, ""), (2, "   "), (3, None), (4, "a b c d e f g h")],
    )
    # Blank/NULL text = 0 tokens, ratio 0.0 (not 1-token or NULL/NaN).
    assert got[1] == (0, 0, 0, 0.0)
    assert got[2] == (0, 0, 0, 0.0)
    assert got[3] == (0, 0, 0, 0.0)
    assert got[4][0] == 8


def test_whitespace_normalization(spark):
    got = _stats(
        spark,
        [(1, "  a  b c d e f g h  "), (2, "a b\tc d e f g h")],
    )
    # Both normalize to the same 8 tokens -> fully duplicated.
    assert got[1] == (8, 1, 8, 1.0)
    assert got[2] == (8, 1, 8, 1.0)


def test_pairs_basic_and_shared_count(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e f g h i j"),
            (2, "x x a b c d e f g h z"),
            (5, "m n o p q r s t u"),
            (6, "z2 m n o p q r s t u"),
            (7, "q1 q2 q3 q4 q5 q6 q7 q8"),
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): r["shared_spans"]
        for r in sp.span_dedup_pairs(df, "text", "doc_id", k=8).collect()
    }
    assert got == {(1, 2): 1, (5, 6): 2}


def test_pairs_within_doc_repeat_is_not_a_pair(spark):
    df = _docs(spark, [(1, "p q r s t u v w p q r s t u v w")])
    assert sp.span_dedup_pairs(df, "text", "doc_id", k=8).count() == 0


def test_pairs_boilerplate_bucket_guard(spark):
    shared = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = _docs(
        spark,
        [(i, f"u{i} {shared}") for i in range(1, 4)]
        + [(10, "v w x y zz aa bb cc")],
    )
    # 3 docs share the span; max_bucket=2 drops the whole group.
    assert (
        sp.span_dedup_pairs(df, "text", "doc_id", k=8, max_bucket=2).count()
        == 0
    )
    # max_bucket=3 keeps it: C(3,2) pairs.
    got = sp.span_dedup_pairs(df, "text", "doc_id", k=8, max_bucket=3)
    assert got.count() == 3


def test_stats_plan_no_text_in_shuffle(spark):
    """Every Exchange must carry fingerprints/ids only — if hashing
    ever regresses to AFTER an exchange, full window strings (k x the
    document text) would shuffle, the 10x-regression class CLAUDE.md
    documents for shingles. Checked on the formatted plan: no Exchange
    block's Input/Arguments mention the text or token-array columns."""
    df = _docs(spark, [(1, "a b c d e f g h i j")])
    q = sp.span_dedup_stats(df, "text", "doc_id", k=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = q._jdf.queryExecution().explainString(mode.fromString("formatted"))
    assert "md5" in plan
    # Formatted output: "(N) Exchange\nInput [n]: [cols...]" blocks.
    # The deliberate split-decoupling repartition before the hash
    # stage DOES carry text once — that's the documented materialize-
    # across-an-exchange pattern (r11: it hash-partitions on doc_id so
    # downstream per-doc aggregates reuse it, instead of RoundRobin).
    # The invariant: every text-carrying exchange IS the tokenizer's
    # doc_id-keyed repartition (the counts and spans branches each
    # show their own copy in the initial plan; AQE's ReusedExchange
    # dedupes them at runtime), and the token ARRAY never crosses any
    # exchange — if hashing ever regressed to after a derived-key
    # shuffle, window strings (k x the document text) would shuffle,
    # the 10x-regression class CLAUDE.md documents for shingles.
    blocks = plan.split("\n\n")
    exchanges = [b for b in blocks if ") Exchange" in b]
    assert exchanges, "plan should contain exchanges"
    for b in exchanges:
        carries_text = False
        for line in b.splitlines():
            if line.startswith("Input") or line.startswith("Arguments"):
                assert "__w#" not in line, line
                if "text#" in line:
                    carries_text = True
        if carries_text:
            args = [
                line for line in b.splitlines() if line.startswith("Arguments")
            ]
            assert args and "hashpartitioning(doc_id#" in args[0], b


# ---- span_dedup_trim / span_decontaminate (r11) ----


def _trim(spark, rows, k=4):
    out = sp.span_dedup_trim(_docs(spark, rows), "text", "doc_id", k=k)
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned"])
        for r in out.collect()
    }


def test_trim_keeps_exactly_one_copy(spark):
    """A verbatim k-run repeated across docs survives ONLY in the
    minimal (doc_id, pos) owner; the other copy is cut whole."""
    run = "a b c d"
    t = _trim(
        spark,
        [(1, f"{run} x y z w"), (2, f"p q r s {run}")],
        k=4,
    )
    assert t[1] == (8, 0, "a b c d x y z w")  # canonical owner intact
    assert t[2] == (8, 4, "p q r s")  # duplicate occurrence removed


def test_trim_within_doc_repeat(spark):
    """A within-doc repeat keeps the first occurrence (its window is
    the canonical) and cuts the second."""
    t = _trim(spark, [(5, "a b c d x a b c d")], k=4)
    assert t[5] == (9, 4, "a b c d x")


def test_trim_longer_run_removed_whole(spark):
    """An m > k repeated run is cut completely in the non-canonical
    doc (every window of the run is redundant there), and untouched
    docs pass through byte-identical."""
    run = "a b c d e f"  # m=6, k=4 -> 3 windows
    t = _trim(
        spark,
        [(1, run), (2, f"{run} tail tok"), (3, "clean doc here ok")],
        k=4,
    )
    assert t[1] == (6, 0, run)
    assert t[2] == (8, 6, "tail tok")
    assert t[3] == (4, 0, "clean doc here ok")


def test_trim_blank_null_and_short_docs(spark):
    t = _trim(
        spark,
        [(1, ""), (2, None), (3, "a b c")],  # all below k=4
        k=4,
    )
    assert t[1] == (0, 0, "")
    assert t[2] == (0, 0, "")
    assert t[3] == (3, 0, "a b c")


def test_decontaminate_cuts_benchmark_spans_only(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    corpus = _docs(
        spark,
        [
            (1, "intro words the quick brown fox jumps outro"),
            (2, "totally unrelated clean text here"),
        ],
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned"])
        for r in sp.span_decontaminate(
            corpus, bench.select("text"), "text", "doc_id", k=5
        ).collect()
    }
    assert out[1] == (8, 5, "intro words outro")
    assert out[2] == (5, 0, "totally unrelated clean text here")

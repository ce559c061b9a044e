"""Bigram-LM cross-entropy perplexity filter (llm/lm.py)."""

import math

import pytest

from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _py_ce(rows, ref_source):
    """Pure-python replica: add-1 bigram LM on the reference slice,
    4-decimal log terms, position-ordered fold."""
    cb: dict[tuple[str, str], int] = {}
    cu: dict[str, int] = {}
    vocab = set()
    for _, text, s in rows:
        w = " ".join(text.split()).split(" ")
        if s == ref_source and len(w) > 1:
            vocab.update(w)
            for a, b in zip(w, w[1:]):
                cb[(a, b)] = cb.get((a, b), 0) + 1
                cu[a] = cu.get(a, 0) + 1
    V = len(vocab) + 1
    out = {}
    for i, text, _ in rows:
        w = " ".join(text.split()).split(" ")
        if len(w) < 2:
            out[i] = (0, None)
            continue
        acc = 0.0
        for a, b in zip(w, w[1:]):
            acc = acc + round(
                math.log((cb.get((a, b), 0) + 1.0) / (cu.get(a, 0) + V)), 4
            )
        n = len(w) - 1
        out[i] = (n, (-acc) / n)
    return out


ROWS = [
    (1, "the cat sat on the mat", "ref"),
    (2, "the dog sat on the mat", "ref"),
    (3, "the cat sat on the mat", "raw"),       # in-distribution
    (4, "mat the on sat cat the", "raw"),       # scrambled: unseen bigrams
    (5, "zz qq vv totally unseen tokens", "raw"),
    (6, "single", "raw"),
    (7, "", "raw"),
]


def test_matches_python_replica_exactly(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in lm.lm_cross_entropy(
            _docs(spark, ROWS), F.col("source") == "ref"
        ).collect()
    }
    assert got == _py_ce(ROWS, "ref")


def test_reference_like_text_scores_lower(spark):
    got = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm.lm_cross_entropy(
            _docs(spark, ROWS), F.col("source") == "ref"
        ).collect()
    }
    # Verbatim reference sentence scores lowest. Fully-unseen vocab
    # falls back to uniform 1/V; scrambled text with *seen* histories
    # but unseen continuations pays 1/(C(w1)+V) < 1/V per bigram, so
    # it scores highest — standard add-1 smoothing behavior.
    assert got[3] < got[5] < got[4]


def test_short_docs_get_null_not_crash(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in lm.lm_cross_entropy(
            _docs(spark, ROWS), F.col("source") == "ref"
        ).collect()
    }
    assert got[6] == (0, None)
    assert got[7] == (0, None)


def test_empty_reference_degenerates_to_uniform(spark):
    rows = [(1, "a b a b", "raw"), (2, "c d", "raw")]
    out = lm.lm_cross_entropy(
        _docs(spark, rows), F.lit(False)
    ).collect()
    got = {r["doc_id"]: r["cross_entropy"] for r in out}
    # V = 1, all probs = (0+1)/(0+1) = 1 -> ln 1 = 0 -> ce = 0.
    assert got[1] == 0.0 and got[2] == 0.0


def _py_ce_kn(rows, ref_source, D=0.75):
    """Pure-python Kneser-Ney replica: absolute discount D, add-1
    continuation distribution, 4-dp ln terms, position-ordered fold."""
    cb: dict[tuple[str, str], int] = {}
    for _, text, s in rows:
        w = " ".join(text.split()).split(" ")
        if s == ref_source and len(w) > 1:
            for a, b in zip(w, w[1:]):
                cb[(a, b)] = cb.get((a, b), 0) + 1
    cu: dict[str, int] = {}
    n1f: dict[str, int] = {}
    nh: dict[str, int] = {}
    vocab = set()
    for (a, b), c in cb.items():
        cu[a] = cu.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        nh[b] = nh.get(b, 0) + 1
        vocab.update((a, b))
    NT, V = len(cb), len(vocab) + 1

    def pcont(b):
        return (nh.get(b, 0) + 1.0) / float(NT + V)

    out = {}
    for i, text, _ in rows:
        w = " ".join(text.split()).split(" ")
        if len(w) < 2:
            out[i] = (0, None)
            continue
        acc = 0.0
        for a, b in zip(w, w[1:]):
            if a not in cu:
                p = pcont(b)
            else:
                p = (max(cb.get((a, b), 0) - D, 0.0)
                     + D * n1f[a] * pcont(b)) / cu[a]
            acc += round(math.log(p), 4)
        n = len(w) - 1
        out[i] = (n, (-acc) / n)
    return out


def test_kneser_ney_matches_python_replica(spark):
    """KN bigram scoring == the python replica exactly (after the 4-dp
    term quantize), covering: seen bigram above/below the discount,
    unseen bigram under a seen history (pure backoff), unseen history
    (continuation-only), and a <2-token doc. Also pins the KN insight:
    a frequent single-history word gets LESS backoff mass than a rarer
    multi-history word."""
    rows = [
        (1, "san francisco san francisco san francisco", "ref"),
        (2, "a b c b a b", "ref"),
        (3, "san b a francisco", "ref"),
        (4, "a francisco c b san zz", "other"),   # unseen bigrams + zz
        (5, "zz qq", "other"),                    # unseen history
        (6, "one", "other"),                      # no bigrams
    ]
    df = _docs(spark, rows)
    got = {
        r.doc_id: (r.n_bigrams, r.cross_entropy_kn)
        for r in lm.lm_cross_entropy_kn(df, F.col("source") == "ref")
        .collect()
    }
    exp = _py_ce_kn(rows, "ref")
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], (k, got[k], exp[k])
        if exp[k][1] is None:
            assert got[k][1] is None, (k, got[k])
        else:
            assert got[k][1] == pytest.approx(exp[k][1], abs=1e-12), (
                k, got[k], exp[k],
            )
    # the Kneser-Ney property: 'francisco' is the most frequent token
    # in-reference but follows only {san, b}; 'b' follows {a, c, san}
    # -> p_cont(b) > p_cont(francisco) despite lower raw frequency
    cb = {}
    for _, text, s in rows:
        w = text.split()
        if s == "ref":
            for a, b2 in zip(w, w[1:]):
                cb[(a, b2)] = cb.get((a, b2), 0) + 1
    nh_fr = len({a for (a, b2) in cb if b2 == "francisco"})
    nh_b = len({a for (a, b2) in cb if b2 == "b"})
    assert nh_b > nh_fr


@pytest.mark.slow
def test_loo_source_cross_entropy_replica_and_null_source(spark):
    """LOO-by-subtraction == a direct python per-source retrain
    replica (train on all other sources, add-1, integer 1e-4 term
    quantize, order-free sums); a NULL source is its own surviving
    group; single-source corpora degenerate to CE 0 (p = 1)."""
    rows = [
        (1, "a b a b c", "s1"),
        (2, "a b c d", "s1"),
        (3, "c d c d", "s2"),
        (4, "a b x", None),
        (5, "q", "s2"),  # no bigrams
    ]
    df = _docs(spark, rows)
    got = {
        r.source: (r.n_bigrams, r.loo_cross_entropy)
        for r in lm.loo_source_cross_entropy(df).collect()
    }

    def replica(src):
        import math as _m

        others = [r for r in rows if r[2] != src]
        cb, cu, vocab = {}, {}, set()
        for _, text, _s in others:
            w = " ".join(text.split()).split(" ")
            if len(w) > 1:
                vocab.update(w)
                for a, b in zip(w, w[1:]):
                    cb[(a, b)] = cb.get((a, b), 0) + 1
                    cu[a] = cu.get(a, 0) + 1
        tot_micro, n = 0, 0
        for _, text, _s in rows:
            if _s != src:
                continue
            w = " ".join(text.split()).split(" ")
            for a, b in zip(w, w[1:]):
                p = (cb.get((a, b), 0) + 1.0) / (
                    cu.get(a, 0) + len(vocab) + 1
                )
                tot_micro += _m.floor(_m.log(p) * 1e4 + 0.5)
                n += 1
        if n == 0:
            return None
        return n, _m.floor(-tot_micro / (n * 1e4) * 1e6 + 0.5) / 1e6

    for src in ["s1", "s2", None]:
        exp = replica(src)
        assert got[src] == exp, (src, got[src], exp)
    # vocabulary subtraction: 'x' appears ONLY in the NULL source, so
    # it leaves the NULL source's LOO vocab but stays in s1's/s2's
    # (the replica enforces this; equality above proves the engine's
    # subtraction matches a true retrain)
    # single-source degenerate: one source only -> p = 1 -> CE 0
    solo = _docs(spark, [(1, "a b c", "only")])
    r = lm.loo_source_cross_entropy(solo).collect()[0]
    assert (r.source, r.n_bigrams, r.loo_cross_entropy) == ("only", 2, 0.0)

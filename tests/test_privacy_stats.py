"""ops/privacy audits, the seeded bootstrap CI, and the directional
n-gram overlap metrics — exact-value tests against hand-computed and
independent-python replicas."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row

from nhs_data_pipeline_spark.llm import dedup as dd
from nhs_data_pipeline_spark.ops import analytics as oan
from nhs_data_pipeline_spark.ops import privacy as opv


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity
# ---------------------------------------------------------------------------

def _people(spark):
    rows = [
        # (zip, age_band, disease)
        ("111", "30s", "flu"),
        ("111", "30s", "flu"),
        ("111", "30s", "cold"),
        ("111", "30s", "cold"),
        ("111", "30s", "flu"),   # class size 5, diversity 2
        ("222", "40s", "flu"),
        ("222", "40s", "flu"),   # class size 2, diversity 1
        ("333", "50s", "cold"),  # class size 1, diversity 1
        (None, "50s", None),
        (None, "50s", "flu"),    # NULL quasi key: one class, size 2,
                                 # diversity 2 (NULL sensitive counts)
    ]
    return spark.createDataFrame(rows, "zip string, age string, disease string")


def test_k_anonymity_report_exact(spark):
    out = opv.k_anonymity_report(_people(spark), ["zip", "age"], k=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k == 3
    assert r.n_rows == 10
    assert r.n_classes == 4
    assert r.min_class_size == 1
    # classes below 3: ('222','40s') size 2, ('333','50s') size 1,
    # (NULL,'50s') size 2 -> 3 classes, 5 rows
    assert r.n_risky_classes == 3
    assert r.rows_at_risk == 5
    assert r.risk_share == 0.5


def test_l_diversity_report_exact(spark):
    out = opv.l_diversity_report(
        _people(spark), ["zip", "age"], "disease", l=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.l == 2
    assert r.n_rows == 10
    assert r.n_classes == 4
    assert r.min_diversity == 1
    # diversity: 111->2, 222->1, 333->1, NULL->2 (NULL disease is a
    # distinct sensitive value via the sentinel)
    assert r.n_risky_classes == 2
    assert r.rows_at_risk == 3
    assert r.risk_share == 0.3


def test_t_closeness_report_exact(spark):
    """Hand-computed TVDs over _people (global: flu 6/10, cold 3/10,
    NULL 1/10): 111 -> 0.1, 222 -> 0.4, 333 -> 0.7, (NULL,'50s') ->
    0.4. At t=0.25 the last three are risky."""
    out = opv.t_closeness_report(
        _people(spark), ["zip", "age"], "disease", t=0.25
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.t == 0.25
    assert r.n_rows == 10
    assert r.n_classes == 4
    assert r.max_distance == 0.7
    assert r.n_risky_classes == 3
    assert r.rows_at_risk == 5
    assert r.risk_share == 0.5


def test_t_closeness_boundary_is_exact(spark):
    """TVD('222') = 16/40 = 0.4 EXACTLY: at t=0.4 the risky test is
    5*tnum > 2*2nN i.e. 80 > 80 -> false. A float boundary compare
    would coin-flip this; the integer one cannot. Only 333 (0.7)
    stays risky."""
    r = opv.t_closeness_report(
        _people(spark), ["zip", "age"], "disease", t=0.4
    ).collect()[0]
    assert r.n_risky_classes == 1
    assert r.rows_at_risk == 1


def test_t_closeness_identical_distribution_is_zero(spark):
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "q string, s string")
    r = opv.t_closeness_report(df, ["q"], "s", t=0.0).collect()[0]
    assert r.max_distance == 0.0
    assert r.n_risky_classes == 0
    assert r.risk_share == 0.0


def test_anonymity_classes_null_key_is_a_class(spark):
    cls = {
        (r.zip, r.age): r.class_size
        for r in opv.anonymity_classes(_people(spark), ["zip", "age"]).collect()
    }
    assert cls[(None, "50s")] == 2
    assert cls[("111", "30s")] == 5


# ---------------------------------------------------------------------------
# bootstrap_mean_ci
# ---------------------------------------------------------------------------

def _h60(key, salt: str = "boot") -> int:
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:15], 16)


def _floor6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_bootstrap_ci_python_replica(spark):
    rows = [(i, (i * 37) % 1000 + 1) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    B = 48
    got = oan.bootstrap_mean_ci(df, "v", "k", scale=1, replicates=B).collect()[0]
    # independent replica
    means = []
    for b in range(B):
        sel = [v for k, v in rows if (_h60(k) >> b) & 1 == 1]
        means.append(sum(sel) / len(sel))
    means.sort()
    n = len(rows)
    assert got.n_rows == n
    assert got.n_replicates == B
    assert got.mean_value == _floor6(sum(v for _, v in rows) / n)
    # ceil(48/40) = 2, ceil(48*39/40) = 47 (1-indexed order stats)
    assert got.ci_lo == _floor6(means[1])
    assert got.ci_hi == _floor6(means[46])
    assert got.ci_lo <= got.mean_value <= got.ci_hi


def test_bootstrap_ci_partitioning_invariant(spark):
    rows = [(i, i * i % 503) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    a = oan.bootstrap_mean_ci(df, "v", "k").collect()[0]
    b = oan.bootstrap_mean_ci(df.repartition(7), "v", "k").collect()[0]
    assert a == b


def test_bootstrap_ci_excludes_null_keys_and_values(spark):
    rows = [Row(k=1, v=10), Row(k=2, v=None), Row(k=None, v=99), Row(k=3, v=20)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    got = oan.bootstrap_mean_ci(df, "v", "k").collect()[0]
    assert got.n_rows == 2
    assert got.mean_value == 15.0


def test_bootstrap_ci_empty_replicate_coalesces_to_overall_mean(spark):
    """A half-sample replicate that keeps NO rows (all hash bits 0 —
    guaranteed for a 1-row input on the ~24 zero bits of its hash) has
    a NULL mean; Spark's sort_array puts NULLs first while DuckDB's
    list_sort order differs, so NULLs must never reach the sort. The
    guard coalesces empty replicates to the overall mean (r06 ADVICE):
    for a single row, every replicate mean is then exactly the value."""
    df = spark.createDataFrame([(1, 10)], "k bigint, v bigint")
    got = oan.bootstrap_mean_ci(df, "v", "k").collect()[0]
    assert got.n_rows == 1
    assert got.mean_value == 10.0
    assert got.ci_lo == 10.0 and got.ci_hi == 10.0


def test_bootstrap_ci_scale_divides_back(spark):
    # cents -> units: scale=100
    rows = [(i, 12345) for i in range(1, 100)]
    df = spark.createDataFrame(rows, "k bigint, cents bigint")
    got = oan.bootstrap_mean_ci(df, "cents", "k", scale=100).collect()[0]
    assert got.mean_value == 123.45
    assert got.ci_lo == 123.45 and got.ci_hi == 123.45


# ---------------------------------------------------------------------------
# ngram_overlap_scores
# ---------------------------------------------------------------------------

def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _bigrams(t: str) -> set[str]:
    w = t.split()
    return {f"{a} {b}" for a, b in zip(w, w[1:])}


def test_overlap_scores_exact_values(spark):
    texts = [
        "a b c d e",          # bigrams {ab,bc,cd,de}
        "a b c d e f",        # {ab,bc,cd,de,ef} — contains doc0
        "x y z w q r s t u",  # disjoint
    ]
    out = {
        (r.id_a, r.id_b): r
        for r in dd.ngram_overlap_scores(_docs(spark, texts), 0.5).collect()
    }
    assert set(out) == {(0, 1)}
    r = out[(0, 1)]
    A, B = _bigrams(texts[0]), _bigrams(texts[1])
    i, na, nb = len(A & B), len(A), len(B)
    assert (r.inter, r.n_a, r.n_b) == (i, na, nb)
    assert r.jaccard == round(i / (na + nb - i), 6)
    assert r.containment == 1.0  # doc0's bigrams all inside doc1
    assert r.f1 == round(2 * i / (na + nb), 6)


def test_overlap_threshold_is_exact_fraction(spark):
    # J = 3/7 exactly: i=3, na=5, nb=5 -> keep at t<=3/7, drop above
    texts = ["a b c d e f", "a b c d x z"]
    # bigrams0 {ab,bc,cd,de,ef}; bigrams1 {ab,bc,cd,dx,xz}; i=3
    lo = dd.ngram_overlap_scores(_docs(spark, texts), threshold=3 / 7)
    hi = dd.ngram_overlap_scores(_docs(spark, texts), threshold=0.43)
    assert lo.count() == 1
    assert hi.count() == 0


def test_overlap_matches_exact_jaccard_pairs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over a lazy dog",
        "completely different content here with nothing shared at all",
        "the quick brown fox jumps over the lazy dog",
    ]
    df = _docs(spark, texts)
    ov = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_overlap_scores(df, 0.5).collect()
    }
    ex = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.exact_jaccard_join(df, threshold=0.5).collect()
    }
    assert ov == ex


# ---------------------------------------------------------------------------
# psi_report
# ---------------------------------------------------------------------------

def test_psi_identical_distributions_is_zero(spark):
    rows = [(v,) for v in [10, 20, 30, 40, 50] * 20]
    a = spark.createDataFrame(rows, "v bigint")
    b = spark.createDataFrame(rows, "v bigint")
    r = oan.psi_report(a, b, "v", bucket_width=10).collect()[0]
    assert r.psi == 0.0
    assert r.n_a == r.n_b == 100


def test_psi_python_replica(spark):
    import math

    va = [(i * 7) % 100 for i in range(200)]
    vb = [(i * 13) % 60 + 40 for i in range(150)]  # shifted slice
    a = spark.createDataFrame([(v,) for v in va], "v bigint")
    b = spark.createDataFrame([(v,) for v in vb], "v bigint")
    W = 16
    got = oan.psi_report(a, b, "v", bucket_width=W).collect()[0]

    from collections import Counter

    ca = Counter(v // W for v in va)
    cb = Counter(v // W for v in vb)
    buckets = set(ca) | set(cb)
    na, nb, k = len(va), len(vb), len(buckets)
    s = 0
    for bk in buckets:
        pa_num = (ca.get(bk, 0) + 1) * (nb + k)
        pb_num = (cb.get(bk, 0) + 1) * (na + k)
        lnq = math.floor(math.log(pa_num / pb_num) * 1e6 + 0.5)
        s += (pa_num - pb_num) * lnq
    psi = math.floor(s / (float(na + k) * float(nb + k)) + 0.5) / 1e6
    assert got.n_a == na and got.n_b == nb and got.n_buckets == k
    assert got.psi == psi
    assert got.psi > 0.25  # the shifted slice reads as drifted


def test_psi_one_sided_buckets_finite(spark):
    # disjoint supports: smoothing keeps every term finite
    a = spark.createDataFrame([(v,) for v in [0, 1, 2, 3]], "v bigint")
    b = spark.createDataFrame([(v,) for v in [100, 101]], "v bigint")
    r = oan.psi_report(a, b, "v", bucket_width=4).collect()[0]
    assert r.psi is not None and r.psi > 0.25
    assert r.n_buckets == 2


def test_psi_null_values_excluded(spark):
    a = spark.createDataFrame([(1,), (None,), (2,)], "v bigint")
    b = spark.createDataFrame([(1,), (2,)], "v bigint")
    r = oan.psi_report(a, b, "v", bucket_width=4).collect()[0]
    assert r.n_a == 2 and r.n_b == 2 and r.psi == 0.0


def test_psi_by_group_localizes_drift(spark):
    """One group identical across sides (psi 0), one shifted, one
    present only in B — finite large psi with its key intact."""
    a_rows = [("s", v) for v in [10, 20, 30, 40] * 10]
    a_rows += [("d", v) for v in [10, 20, 30, 40] * 10]
    b_rows = [("s", v) for v in [10, 20, 30, 40] * 10]
    b_rows += [("d", v + 200) for v in [10, 20, 30, 40] * 10]
    # a side-absent group's smoothed baseline is UNIFORM over its
    # buckets, so its psi measures B's deviation from uniform (a
    # uniform or one-bucket new group scores 0; absence itself is
    # signalled by n_a=0) — make it skewed so the shape registers
    b_rows += [("new", v) for v in [5] * 16 + [25, 45, 65, 85]]
    a = spark.createDataFrame(a_rows, "g string, v bigint")
    b = spark.createDataFrame(b_rows, "g string, v bigint")
    got = {r.g: r for r in oan.psi_by_group(a, b, ["g"], "v", 16).collect()}
    assert set(got) == {"s", "d", "new"}
    assert got["s"].psi == 0.0
    assert got["d"].psi > 0.25
    assert got["new"].n_a == 0 and got["new"].n_b == 20
    assert got["new"].psi is not None and got["new"].psi > 0.25


def test_psi_by_group_matches_scalar_on_single_group(spark):
    rows_a = [("only", (i * 7) % 90) for i in range(150)]
    rows_b = [("only", (i * 11) % 120) for i in range(130)]
    a = spark.createDataFrame(rows_a, "g string, v bigint")
    b = spark.createDataFrame(rows_b, "g string, v bigint")
    grouped = oan.psi_by_group(a, b, ["g"], "v", 16).collect()[0]
    scalar = oan.psi_report(a, b, "v", 16).collect()[0]
    assert grouped.psi == scalar.psi
    assert (grouped.n_a, grouped.n_b, grouped.n_buckets) == (
        scalar.n_a, scalar.n_b, scalar.n_buckets,
    )


class TestDpCounts:
    """ops/privacy.dp_group_counts — seeded Laplace mechanism."""

    def test_noise_matches_python_replica_and_distribution(self, spark):
        """Noise replays the exact inverse-CDF from the md5 uniform;
        across many groups the noise is centered near 0 with the
        Laplace b=1 spread."""
        import hashlib
        import math

        from nhs_data_pipeline_spark.ops import privacy as opv2

        rows = [(f"g{i}", j) for i in range(200) for j in range(3)]
        df = spark.createDataFrame(rows, "g string, x int")
        got = {r.g: r for r in
               opv2.dp_group_counts(df, "g", epsilon=1.0,
                                    salt="t1").collect()}
        assert len(got) == 200
        noises = []
        for i in range(200):
            key = f"g{i}"
            h = int(hashlib.md5(f"{key}:t1".encode()).hexdigest()[:8], 16)
            u = (h + 0.5) / 4294967296.0
            if u < 0.5:
                xm = math.floor(1.0 * math.log(2.0 * u) * 1e6 + 0.5)
            else:
                xm = math.floor(-1.0 * math.log(2.0 * (1.0 - u)) * 1e6 + 0.5)
            assert got[key].noisy_micro == 3 * 1000000 + xm, key
            noises.append(xm / 1e6)
        mean = sum(noises) / len(noises)
        assert abs(mean) < 0.3                       # centered
        assert sum(1 for n in noises if abs(n) > 0.6) > 20  # real spread

    def test_epsilon_scales_noise_and_validates(self, spark):
        import pytest as _pytest

        from nhs_data_pipeline_spark.ops import privacy as opv2

        df = spark.createDataFrame([("a", 1)] * 5, "g string, x int")
        n1 = opv2.dp_group_counts(df, "g", epsilon=1.0).collect()[0]
        n10 = opv2.dp_group_counts(df, "g", epsilon=10.0).collect()[0]
        d1, d10 = n1.noisy_count - 5, n10.noisy_count - 5
        assert abs(d10) < abs(d1) or d1 == 0.0
        with _pytest.raises(ValueError):
            opv2.dp_group_counts(df, "g", epsilon=0.0)

    def test_null_group_gets_noise_not_null(self, spark):
        from nhs_data_pipeline_spark.ops import privacy as opv2

        df = spark.createDataFrame(
            [(None, 1), (None, 2), ("a", 3)], "g string, x int"
        )
        got = {r.g: r for r in opv2.dp_group_counts(df, "g").collect()}
        assert got[None].noisy_micro is not None
        assert abs(got[None].noisy_count - 2) < 10  # count 2 + Laplace(1)

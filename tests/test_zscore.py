"""Deterministic z-score outliers (ops/analytics.zscore_outliers)."""

import math

from nhs_data_pipeline_spark.ops.analytics import zscore_outliers


def _df(spark, rows):
    return spark.createDataFrame(rows, "event_id long, grp string, value double")


def test_matches_exact_arithmetic_replica(spark):
    # Enough inliers that the planted spike exceeds 3 sigma (max
    # attainable |z| over n points is (n-1)/sqrt(n) ~ 2 at n=6, so a
    # tiny sample can never flag anything).
    vals = [1.0 + 0.01 * (i % 7) for i in range(30)] + [50.0]
    rows = [(i, "a", float(v)) for i, v in enumerate(vals)]
    out = zscore_outliers(_df(spark, rows), "value", ["grp"], threshold=3.0)
    got = {r["event_id"]: r["zscore"] for r in out.collect()}
    # Replica with the same fixed op sequence.
    q = [round(v * 100) for _, _, v in rows]
    n = len(q)
    m = (float(sum(q)) / 100.0) / n
    ex2 = (float(sum(x * x for x in q)) / 10000.0) / n
    sd = math.sqrt(max(ex2 - m * m, 0.0))
    want = {
        i: (v - m) / sd
        for i, _, v in rows
        if sd > 0 and abs((v - m) / sd) > 3.0
    }
    assert got == want
    assert set(got) == {30}  # only the planted anomaly


def test_constant_group_emits_nothing(spark):
    rows = [(i, "c", 4.2) for i in range(10)]
    assert zscore_outliers(_df(spark, rows), "value", ["grp"]).count() == 0


def test_null_values_do_not_dilute_mean(spark):
    rows = [(0, "a", 1.0), (1, "a", 1.1), (2, "a", 0.9), (3, "a", 1.0),
            (4, "a", 9.0), (5, "a", None)]
    out = zscore_outliers(_df(spark, rows), "value", ["grp"], threshold=1.5)
    ids = {r["event_id"] for r in out.collect()}
    assert 5 not in ids       # NULL row never flags
    assert 4 in ids           # the anomaly still does


def test_nan_inf_rows_quarantined_not_fatal(spark):
    """ANSI Spark: a bare cast would throw on NaN/Inf/overflow. The
    try_cast must drop those rows from the statistics (not dilute the
    mean) while the query keeps running; the finite-but-unquantizable
    overflow row still flags as the extreme outlier it is."""
    inliers = [(i, "a", 1.0 + 0.01 * (i % 7)) for i in range(30)]
    rows = inliers + [
        (100, "a", float("nan")),
        (101, "a", float("inf")),
        (102, "a", 1e18),  # overflows decimal(19,0) after *100
        (103, "a", 50.0),  # ordinary planted outlier
    ]
    df = _df(spark, rows)
    out = zscore_outliers(df, "value", ["grp"], threshold=3.0)
    got = {r["event_id"] for r in out.collect()}
    # NaN comparisons are false; inf/overflow rows have huge finite-
    # or-infinite z and do flag; stats come from the 31 quantizable
    # finite rows only, so the 50.0 spike still exceeds 3 sigma.
    assert got == {101, 102, 103}  # NaN row (100) never flags


def test_grouping_is_per_group(spark):
    rows = [(0, "a", 1.0), (1, "a", 1.0), (2, "a", 1.0), (3, "a", 100.0),
            (4, "b", 100.0), (5, "b", 100.0), (6, "b", 100.0), (7, "b", 1.0)]
    out = zscore_outliers(_df(spark, rows), "value", ["grp"], threshold=1.0)
    got = {r["event_id"] for r in out.collect()}
    assert got == {3, 7}  # each group's own anomaly, not a global one

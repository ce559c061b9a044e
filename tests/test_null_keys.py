"""NULL-key and crash-window regressions across the warehouse ops
(found by adversarial review: NULL org codes are routine in NHS feeds,
so every keyed op must either handle NULL keys coherently or fail
loudly — never silently drop/duplicate/misroute them)."""

from pyspark.sql import functions as F

from nhs_data_pipeline_spark.ops.analytics import peak_concurrency
from nhs_data_pipeline_spark.ops.core import clean_names, dedupe_positional
from nhs_data_pipeline_spark.ops.diff import snapshot_diff
from nhs_data_pipeline_spark.ops.merge import merge_upsert
from nhs_data_pipeline_spark.ops.quality import check_unique
from nhs_data_pipeline_spark.ops.sampling import (
    deterministic_shuffle,
    hash_split,
    temperature_sample,
)


def test_merge_upsert_null_keys_match_in_both_paths(spark):
    t = spark.createDataFrame([(None, "a"), ("k1", "x")], "k string, v string")
    s = spark.createDataFrame([(None, "b"), ("k2", "y")], "k string, v string")
    for bc in (False, True):
        out = merge_upsert(
            t, s, keys=["k"], broadcast_source=bc, action_col="action"
        )
        rows = {(r["k"], r["v"], r["action"]) for r in out.collect()}
        assert rows == {
            (None, "b", "updated"),   # NULL keys MATCH (null-safe)
            ("k1", "x", "carried"),
            ("k2", "y", "inserted"),
        }, f"broadcast_source={bc}"


def test_snapshot_diff_null_key_is_compared_not_added_removed(spark):
    old = spark.createDataFrame([(None, 1)], "k string, v int")
    new = spark.createDataFrame([(None, 2)], "k string, v int")
    out = snapshot_diff(old, new, keys=["k"]).collect()
    assert len(out) == 1
    assert out[0]["diff_status"] == "changed"


def test_peak_concurrency_open_intervals_count(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("g", base, base + datetime.timedelta(hours=1)),
        ("g", base + datetime.timedelta(minutes=10), None),  # still open
        ("g", base + datetime.timedelta(minutes=20), None),  # still open
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    out = peak_concurrency(df, ["k"], "s", "e").collect()
    # All three overlap at minute 20; open intervals never close.
    assert out[0]["peak_concurrency"] == 3


def test_check_unique_null_keys_are_not_violations(spark):
    df = spark.createDataFrame([(1,), (None,)], "k int")
    assert check_unique(df, "k").collect()[0]["violations"] == 0
    dup = spark.createDataFrame([(None,), (None,)], "k int")
    # Two NULL keys ARE a duplicate group (groupBy semantics).
    assert check_unique(dup, "k").collect()[0]["violations"] == 1


def test_deterministic_shuffle_preserves_null_key_rows(spark):
    df = spark.createDataFrame(
        [(None, "a"), (1, "b"), (2, "c")], "k int, v string"
    )
    out = deterministic_shuffle(df, "k")
    assert out.count() == 3  # NULL-key row not dropped by the bucket join


def test_temperature_sample_keeps_null_stratum_rows(spark):
    rows = [(i, "s1") for i in range(20)] + [(100 + i, None) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, src string")
    out = temperature_sample(df, "k", "src", alpha=0.5)
    srcs = {r["src"] for r in out.collect()}
    # Equal-size strata at alpha=0.5 keep everything — including the
    # NULL stratum, which a plain == join would have dropped entirely.
    assert srcs == {"s1", None}
    assert out.count() == 40


def test_hash_split_null_keys_deterministic_not_last_bucket(spark):
    df = spark.createDataFrame(
        [(None,) for _ in range(5)] + [(i,) for i in range(100)], "k int"
    )
    out = hash_split(df, "k", {"train": 0.98, "test": 0.02})
    null_splits = {
        r["split"] for r in out.filter(F.col("k").isNull()).collect()
    }
    assert len(null_splits) == 1  # all NULLs together, deterministically
    # and they follow the hash of the sentinel, not the otherwise()
    # fall-through: with 98% train weight they land in train.
    assert null_splits == {"train"}


def test_dedupe_positional_secondary_collision(spark):
    # One pass would yield ['total_1', 'total_2', 'total_2'] — the
    # helper must iterate until names are unique.
    out = dedupe_positional(["total", "total", "total_2"])
    assert len(set(out)) == 3
    df = spark.createDataFrame([(1, 2, 3)], ["Total", "total", "total_2"])
    cleaned = clean_names(df)
    assert len(set(cleaned.columns)) == 3
    cleaned.select(cleaned.columns[2])  # no AMBIGUOUS_REFERENCE

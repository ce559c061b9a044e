"""Salted skew join and mergeable HLL sketches."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nhs_data_pipeline_spark.ops.skew import salted_join


def _skewed(spark):
    # one hot key (90%), two cold keys
    rows = [(i, "hot" if i % 10 else "cold" + str(i % 2), float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "id bigint, k string, v double")


def _dim(spark):
    return spark.createDataFrame(
        [("hot", 1.0), ("cold0", 2.0), ("cold1", 3.0)], "k string, w double"
    )


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, spark):
        big, dim = _skewed(spark), _dim(spark)
        got = salted_join(big, dim, ["k"], salt_buckets=8)
        want = big.join(dim, ["k"])
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_left_preserves_unmatched(self, spark):
        big, dim = _skewed(spark), _dim(spark)
        dim2 = dim.filter(F.col("k") != "cold1")
        got = salted_join(big, dim2, ["k"], how="left")
        want = big.join(dim2, ["k"], "left")
        assert got.count() == big.count()
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_rejects_outer(self, spark):
        with pytest.raises(ValueError):
            salted_join(_skewed(spark), _dim(spark), ["k"], how="full_outer")

    def test_salt_spreads_hot_key(self, spark):
        big = _skewed(spark).withColumn(
            "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int")
        )
        n_sub = (
            big.filter(F.col("k") == "hot")
            .select("__salt")
            .distinct()
            .count()
        )
        assert n_sub == 8  # the hot key occupies all 8 sub-keys


class TestHllMergeable:
    def test_union_of_shards_equals_direct_sketch(self, spark):
        df = spark.createDataFrame(
            [(i % 7, i % 97, i % 5) for i in range(2000)], "g int, u int, shard int"
        )
        direct = df.groupBy("g").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("est")
        )
        merged = (
            df.groupBy("g", "shard")
            .agg(F.hll_sketch_agg("u").alias("sk"))
            .groupBy("g")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        )
        d = {r["g"]: r["est"] for r in direct.collect()}
        m = {r["g"]: r["est"] for r in merged.collect()}
        assert d == m  # sketch union is exact over sketches

    def test_estimate_close_to_exact(self, spark):
        df = spark.createDataFrame(
            [(i % 3, (i * 131) % 1009) for i in range(5000)], "g int, u int"
        )
        est = {
            r["g"]: r["est"]
            for r in df.groupBy("g")
            .agg(F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("est"))
            .collect()
        }
        exact = {
            r["g"]: r["n"]
            for r in df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()
        }
        for g, n in exact.items():
            assert abs(est[g] - n) / n < 0.05

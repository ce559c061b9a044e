"""Round-3 ops: token-budget mixtures, per-stratum caps, deterministic
global shuffle, and CDC snapshot diff."""

from __future__ import annotations

import pyspark.sql.functions as F

from nhs_data_pipeline_spark.ops.diff import diff_summary, snapshot_diff
from nhs_data_pipeline_spark.ops.sampling import (
    capped_per_stratum,
    deterministic_shuffle,
    hash_bucket,
    token_budget_sample,
)


def _docs(spark, n=60, strata=3):
    rows = [(i, f"s{i % strata}", 10 + (i * 7) % 50) for i in range(n)]
    return spark.createDataFrame(rows, "id bigint, src string, toks int")


class TestTokenBudget:
    def test_budget_respected_per_stratum(self, spark):
        out = token_budget_sample(_docs(spark), "id", "src", "toks", budget=100)
        sums = {
            r["src"]: r["t"]
            for r in out.groupBy("src").agg(F.sum("toks").alias("t")).collect()
        }
        assert sums and all(v <= 100 for v in sums.values())

    def test_prefix_closed_in_hash_order(self, spark):
        # kept set must be a prefix of each stratum's hash ordering:
        # every kept row hashes before every dropped row of its stratum
        df = _docs(spark).withColumn("hb", hash_bucket("id", "tb"))
        kept = token_budget_sample(df, "id", "src", "toks", budget=100)
        kept_ids = {r["id"] for r in kept.select("id").collect()}
        rows = df.select("src", "id", "hb").collect()
        by_src: dict[str, list] = {}
        for r in rows:
            by_src.setdefault(r["src"], []).append((r["hb"], r["id"]))
        for members in by_src.values():
            members.sort()
            seen_drop = False
            for _, i in members:
                if i not in kept_ids:
                    seen_drop = True
                else:
                    assert not seen_drop, "kept row after a dropped row"

    def test_partitioning_independent(self, spark):
        df = _docs(spark)
        a = token_budget_sample(df, "id", "src", "toks", budget=120)
        b = token_budget_sample(df.repartition(7), "id", "src", "toks", budget=120)
        assert sorted(r["id"] for r in a.collect()) == sorted(
            r["id"] for r in b.collect()
        )


class TestCappedPerStratum:
    def test_cap(self, spark):
        out = capped_per_stratum(_docs(spark), "id", "src", k=5)
        counts = out.groupBy("src").count().collect()
        assert len(counts) == 3 and all(r["count"] == 5 for r in counts)

    def test_stable_subset_when_k_grows(self, spark):
        df = _docs(spark)
        small = {r["id"] for r in capped_per_stratum(df, "id", "src", k=3).collect()}
        big = {r["id"] for r in capped_per_stratum(df, "id", "src", k=8).collect()}
        assert small <= big


class TestDeterministicShuffle:
    def test_rank_is_permutation(self, spark):
        df = _docs(spark, n=100)
        out = deterministic_shuffle(df, "id")
        ranks = sorted(r["shuffle_rank"] for r in out.collect())
        assert ranks == list(range(100))

    def test_matches_naive_global_sort(self, spark):
        df = _docs(spark, n=100)
        out = deterministic_shuffle(df, "id")
        got = {r["id"]: r["shuffle_rank"] for r in out.collect()}
        naive = (
            df.withColumn(
                "h", F.md5(F.concat(F.col("id").cast("string"), F.lit(":shuf")))
            )
            .orderBy("h", "id")
            .select("id")
            .collect()
        )
        for pos, r in enumerate(naive):
            assert got[r["id"]] == pos

    def test_partitioning_and_prefix_invariant(self, spark):
        df = _docs(spark, n=80)
        a = deterministic_shuffle(df, "id", prefix_len=2)
        b = deterministic_shuffle(df.repartition(11), "id", prefix_len=4)
        ga = {r["id"]: r["shuffle_rank"] for r in a.collect()}
        gb = {r["id"]: r["shuffle_rank"] for r in b.collect()}
        assert ga == gb


class TestSnapshotDiff:
    def _pair(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
            "k int, name string, bal double",
        )
        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", None), (3, "c", 99.0), (5, "e", 50.0)],
            "k int, name string, bal double",
        )
        return old, new

    def test_statuses(self, spark):
        old, new = self._pair(spark)
        d = snapshot_diff(old, new, keys=["k"])
        got = {r["k"]: r["diff_status"] for r in d.collect()}
        assert got == {
            1: "unchanged",
            2: "unchanged",  # NULL == NULL is not a change
            3: "changed",
            4: "removed",
            5: "added",
        }

    def test_changed_columns_and_null_transitions(self, spark):
        old, new = self._pair(spark)
        new2 = new.withColumn(
            "bal", F.when(F.col("k") == 2, 7.0).otherwise(F.col("bal"))
        ).withColumn(
            "name", F.when(F.col("k") == 3, F.lit(None)).otherwise(F.col("name"))
        )
        d = snapshot_diff(old, new2, keys=["k"])
        rows = {r["k"]: r for r in d.collect()}
        assert rows[2]["changed_columns"] == ["bal"]  # NULL -> value
        assert rows[3]["changed_columns"] == ["bal", "name"]  # sorted
        assert rows[1]["changed_columns"] == []
        # added/removed rows: empty array, NOT the full column list —
        # size(changed_columns) > 0 must be a safe 'changed' predicate
        assert rows[4]["changed_columns"] == []  # removed
        assert rows[5]["changed_columns"] == []  # added

    def test_removed_carries_old_values_and_drifted_cols_ignored(self, spark):
        old, new = self._pair(spark)
        new3 = new.withColumn("extra", F.lit(1))
        d = snapshot_diff(old, new3, keys=["k"])
        rows = {r["k"]: r for r in d.collect()}
        assert rows[4]["bal"] == 40.0 and "extra" not in d.columns

    def test_summary(self, spark):
        old, new = self._pair(spark)
        s = diff_summary(snapshot_diff(old, new, keys=["k"]))
        got = {r["diff_status"]: r["n"] for r in s.collect()}
        assert got == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


class TestDiffMergeRoundtrip:
    """Cross-validation of two ops against each other: applying a
    snapshot_diff through merge_upsert must reconstruct the new
    snapshot exactly (diff ∘ merge = identity)."""

    def test_reconstruct_new_from_old_plus_diff(self, spark):
        from nhs_data_pipeline_spark.ops.merge import merge_upsert

        old = spark.createDataFrame(
            [(i, f"n{i}", float(i) if i % 7 else None) for i in range(60)],
            "k int, name string, bal double",
        )
        new = (
            old.filter(F.col("k") % 11 != 0)  # deletes
            .withColumn(
                "bal",
                F.when(F.col("k") % 5 == 0, F.col("bal") + 1.5).otherwise(
                    F.col("bal")
                ),
            )
            .unionByName(
                spark.createDataFrame(
                    [(100, "new100", 9.0), (101, "new101", None)],
                    "k int, name string, bal double",
                )
            )
        )
        d = snapshot_diff(old, new, keys=["k"])
        upserts = d.filter(
            F.col("diff_status").isin("added", "changed")
        ).select("k", "name", "bal")
        removed_keys = {
            r["k"] for r in d.filter(F.col("diff_status") == "removed").collect()
        }
        merged = merge_upsert(old, upserts, keys=["k"]).filter(
            ~F.col("k").isin(removed_keys)
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, new.collect())
        )


class TestBudgetWaterfill:
    def test_matches_iterative_replica_and_invariants(self, spark):
        """Closed-form waterfilling == the sequential iterative replica
        (process sources smallest-first; alloc = min(t, remaining div
        sources_left)) up to the documented remainder placement, and
        the invariants hold: sum(alloc) == min(B, T), alloc_i <= t_i,
        capped set is a prefix of the (t, key) order, uncapped allocs
        differ by at most 1 with the +1s on the largest."""
        import random

        from nhs_data_pipeline_spark.ops.sampling import budget_waterfill

        rng = random.Random(13)
        for trial in range(6):
            n = rng.randrange(1, 9)
            sizes = {f"s{i}": rng.randrange(0, 500) for i in range(n)}
            rows = [
                (k, 1) for k, t in sizes.items() for _ in range(min(t, 1))
            ]
            # feed per-row tokens that sum to the chosen sizes
            rows = []
            for k, t in sizes.items():
                left = t
                while left > 0:
                    c = min(left, rng.randrange(1, 50))
                    rows.append((k, c))
                    left -= c
                if t == 0:
                    rows.append((k, 0))
            df = spark.createDataFrame(rows, "src string, toks long")
            num, den = rng.choice([(1, 2), (1, 3), (2, 3), (1, 1), (3, 2)])
            got = {
                r["src"]: (r["tokens"], r["alloc"], r["capped"])
                for r in budget_waterfill(df, "src", "toks", num, den).collect()
            }
            T = sum(sizes.values())
            B = T * num // den
            assert {k: v[0] for k, v in got.items()} == sizes, trial
            assert sum(v[1] for v in got.values()) == min(B, T), (trial, got)
            assert all(v[1] <= v[0] for v in got.values()), (trial, got)
            order = sorted(sizes, key=lambda k: (sizes[k], k))
            flags = [got[k][2] for k in order]
            assert flags == sorted(flags, reverse=True), (trial, flags)
            unc = [got[k][1] for k in order if not got[k][2]]
            if unc:
                assert max(unc) - min(unc) <= 1, (trial, unc)
                # +1s go to the LAST uncapped sources in sort order
                assert unc == sorted(unc), (trial, unc)
                # every uncapped alloc stays below its capacity bound
                base = min(unc)
                for k in order:
                    if not got[k][2]:
                        assert got[k][0] >= base + (1 if got[k][1] > base else 0)

    def test_all_capped_and_null_stratum(self, spark):
        """B >= T caps every source at its capacity (no div-by-zero on
        the empty uncapped set); a NULL stratum is its own group and
        orders under the chr(0) sentinel like the oracle."""
        from nhs_data_pipeline_spark.ops.sampling import budget_waterfill

        df = spark.createDataFrame(
            [("a", 10), (None, 3), ("b", 7)], "src string, toks long"
        )
        got = {
            r["src"]: (r["alloc"], r["capped"])
            for r in budget_waterfill(df, "src", "toks", 1, 1).collect()
        }
        assert got == {"a": (10, True), None: (3, True), "b": (7, True)}
        import pytest as _pt

        with _pt.raises(ValueError):
            budget_waterfill(df, "src", "toks", 1, 0)

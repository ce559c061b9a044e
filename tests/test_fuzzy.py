"""Deletion-neighborhood entity resolution (ops/fuzzy.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from nhs_data_pipeline_spark.ops.fuzzy import deletion_keys, fuzzy_match_dist1


def _canon(spark):
    return spark.createDataFrame(
        [("Alpha Trust",), ("Beta Trust",), ("Gamma Centre",)], "name string"
    )


class TestDeletionKeys:
    def test_key_count_is_len_plus_one(self, spark):
        df = spark.createDataFrame([(1, "abc")], "id int, name string")
        keys = deletion_keys(df, "name").select("__key").collect()
        assert sorted(r["__key"] for r in keys) == ["ab", "abc", "ac", "bc"]

    def test_empty_name_emits_only_identity_key(self, spark):
        # sequence(1, 0) steps backwards in Spark ([1, 0]) — an
        # unguarded explode would emit a spurious i=0 variant row
        df = spark.createDataFrame(
            [(1, ""), (2, "a"), (3, None)], "id int, name string"
        )
        keys = [
            (r["id"], r["__key"])
            for r in deletion_keys(df, "name").collect()
        ]
        assert sorted(k for k in keys if k[0] == 1) == [(1, "")]
        assert sorted(k for k in keys if k[0] == 2) == [(2, ""), (2, "a")]
        assert sorted(
            k for k in keys if k[0] == 3
        ) == [(3, None)]  # NULL name: identity key only, no variants


class TestFuzzyMatchDist1:
    def _resolve(self, spark, dirty_rows):
        dirty = spark.createDataFrame(dirty_rows, "id int, name string")
        return {
            r["id"]: (r["matched_name"], r["match_distance"])
            for r in fuzzy_match_dist1(
                dirty, _canon(spark), "id", "name", "name"
            ).collect()
        }

    def test_substitution_deletion_insertion_exact(self, spark):
        got = self._resolve(
            spark,
            [
                (1, "Alpha Trust"),   # exact -> dist 0
                (2, "Alpha Trusx"),   # substitution -> dist 1
                (3, "Beta Trus"),     # deletion -> dist 1
                (4, "Gamma CCentre"), # insertion -> dist 1
                (5, "Delta Trust"),   # dist 2+ from everything -> unmatched
            ],
        )
        assert got[1] == ("Alpha Trust", 0)
        assert got[2] == ("Alpha Trust", 1)
        assert got[3] == ("Beta Trust", 1)
        assert got[4] == ("Gamma Centre", 1)
        assert got[5] == (None, None)

    def test_tie_breaks_by_canonical_name(self, spark):
        canon = spark.createDataFrame([("aab",), ("aac",)], "name string")
        dirty = spark.createDataFrame([(1, "aad")], "id int, name string")
        out = fuzzy_match_dist1(dirty, canon, "id", "name", "name").collect()
        assert out[0]["matched_name"] == "aab"  # both dist 1; name asc

    def test_every_single_edit_is_recovered(self, spark):
        # completeness guarantee: ANY single-char substitution or
        # deletion of a canonical name must produce a candidate
        base = "Alpha Trust"
        rows, expect = [], {}
        i = 0
        for pos in range(len(base)):
            rows.append((i, base[:pos] + "#" + base[pos + 1:]))  # substitute
            expect[i] = 1
            i += 1
            rows.append((i, base[:pos] + base[pos + 1:]))  # delete
            expect[i] = 1
            i += 1
        got = self._resolve(spark, rows)
        for k, d in expect.items():
            assert got[k][0] == base and got[k][1] == d, (k, rows[k], got[k])

    def test_partitioning_invariant(self, spark):
        dirty = spark.createDataFrame(
            [(i, "Alpha Trusx") for i in range(40)], "id int, name string"
        )
        a = fuzzy_match_dist1(dirty, _canon(spark), "id", "name", "name")
        b = fuzzy_match_dist1(
            dirty.repartition(7), _canon(spark), "id", "name", "name"
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_edit_distance_blocked_join_pairs_and_guard(spark):
    """Blocked Levenshtein self-join: finds exactly the within-block
    pairs at dist <= max_dist (python-replica verified), NULL names
    drop, the blocked-pair volume reports exactly, and the budget
    guard refuses before shuffling."""
    import itertools

    import pytest as _pytest

    from nhs_data_pipeline_spark.ops import fuzzy as fz

    names = ["widget_a1", "widget_a2", "widget_b1", "gadget_a1",
             "widget_a1", None]
    df = spark.createDataFrame(
        list(enumerate(names)), "id long, nm string"
    )
    rep: dict = {}
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fz.edit_distance_blocked_join(
            df, "nm", "id", max_dist=1, block_drop=2, report=rep
        ).collect()
    )
    # python replica: same blocking, same classic levenshtein
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    rows = [(i, n) for i, n in enumerate(names) if n is not None]
    expect = sorted(
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if a[:-2] == b[:-2] and lev(a, b) <= 1
    )
    assert got == expect and (0, 4, 0) in got  # exact dup pair found
    exp_vol = sum(
        c * (c - 1) // 2
        for c in __import__("collections").Counter(
            n[:-2] for _, n in rows
        ).values()
    )
    assert rep["blocked_pairs"] == exp_vol
    with _pytest.raises(ValueError, match="max_pairs"):
        fz.edit_distance_blocked_join(
            df, "nm", "id", max_pairs=0
        )
    # cross-engine levenshtein agreement on tricky shapes
    import duckdb

    cases = [("kitten", "sitting"), ("abc", "acb"), ("", "ab"),
             ("aaa", "aa"), ("widget_a1", "widget_b2")]
    sp = spark.createDataFrame(cases, "a string, b string").select(
        F.levenshtein("a", "b").alias("d")
    ).collect()
    dk = [duckdb.sql(f"SELECT levenshtein('{a}','{b}')").fetchone()[0]
          for a, b in cases]
    assert [r.d for r in sp] == dk == [lev(a, b) for a, b in cases]


def test_sorted_neighborhood_matches_python_replica(spark):
    """Rank-window candidates + Levenshtein verify against a direct
    python replica (sorted names, all pairs within `window` positions,
    stdlib edit distance); NULL names drop; the two-pass bucket rank
    must agree with the naive global sort even when names straddle
    bucket boundaries."""
    import itertools

    from nhs_data_pipeline_spark.ops.fuzzy import sorted_neighborhood_join

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    names = [
        "alpha", "alphb", "alpzz", "beta", "betaa", "bets",
        "gamma", "gamma1", "zz", None,
    ]
    rows = [(i, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, nm string")
    W, D = 3, 2
    got = sorted(
        (r.id_a, r.id_b, r.rank_gap, r.dist)
        for r in sorted_neighborhood_join(
            df, "nm", "id", window=W, max_dist=D, bucket_len=2
        ).collect()
    )
    ranked = sorted(
        ((n, i) for i, n in rows if n is not None)
    )
    expect = []
    for x, y in itertools.combinations(range(len(ranked)), 2):
        gap = y - x
        if gap <= W:
            (na, ia), (nb, ib) = ranked[x], ranked[y]
            d = lev(na, nb)
            if d <= D:
                expect.append((ia, ib, gap, d))
    assert got == sorted(expect), (got, expect)
    import pytest as _pt

    with _pt.raises(ValueError):
        sorted_neighborhood_join(df, "nm", "id", window=0)


def test_snj_multipass_reversed_pass_catches_prefix_typos(spark):
    """The reversed-name pass must catch a PREFIX typo the forward
    sort scatters (e.g. 'aupplier_x' sorts far from 'supplier_x'
    forward, adjacent reversed), and the canonical id ordering must
    dedup pairs found by both passes."""
    from nhs_data_pipeline_spark.ops.fuzzy import sorted_neighborhood_join
    from pyspark.sql import functions as F

    names = [
        (0, "supplier_x"), (1, "aupplier_x"),   # prefix typo pair
        (2, "supplier_y"),                      # suffix neighbor of 0
        (3, "mmm"), (4, "qqq"), (5, "zzz"),     # spacers
    ]
    df = spark.createDataFrame(names, "id long, nm string")
    fwd = sorted_neighborhood_join(df, "nm", "id", window=1, max_dist=1,
                                   bucket_len=1)
    fwd_pairs = {(r.id_a, r.id_b) for r in fwd.collect()}
    # forward: (0,2) adjacent (supplier_x ~ supplier_y); the prefix
    # typo (0,1) is NOT adjacent forward at window=1
    assert (0, 2) in fwd_pairs and (0, 1) not in fwd_pairs
    rev_in = df.select("id", F.reverse("nm").alias("rn"))
    rev = sorted_neighborhood_join(rev_in, "rn", "id", window=1,
                                   max_dist=1, bucket_len=1)
    rev_pairs = {tuple(sorted((r.id_a, r.id_b))) for r in rev.collect()}
    # reversed: x_reilppua ~ x_reilppus are adjacent -> caught
    assert (0, 1) in rev_pairs

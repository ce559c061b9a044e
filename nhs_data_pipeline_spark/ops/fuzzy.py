"""Entity resolution: blocked fuzzy matching of dirty names to a
canonical dimension.

The reference's whole org-change subsystem exists because NHS org
names drift (renames, typos, re-coded trusts); its lookups are exact
(orgchange/). This module adds the fuzzy layer a large-scale pipeline
needs when the incoming feed's names don't exactly match the master
dimension.

The naive approach — cross join + edit distance — is O(n*m) and dead
at scale. The scalable shape here is SymSpell-style **deletion-
neighborhood blocking**: every name emits its identity plus each
single-character-deletion variant as block keys; two strings within
edit distance 1 ALWAYS share at least one key (substitution: delete
the differing position from both; insertion/deletion: one string IS a
deletion variant of the other), so the candidate set is complete for
distance <= 1 while each block stays tiny (names sharing a specific
deletion variant). Candidates are then verified with the exact
``levenshtein`` (JVM codegen; DuckDB implements the same unit-cost
metric, so the whole pipeline is exactly cross-engine-checkable).

Shuffles carry (id, name, key) triples; the per-key join is an
equi-join; the best-match pick is a WindowGroupLimit top-1. For
distance <= 2, emit 2-deletion variants (keys grow O(len^2) — the
standard SymSpell trade); not shipped here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deletion_keys(df: DataFrame, name_col: str, out_col: str = "__key") -> DataFrame:
    """Explode each row into its deletion-neighborhood block keys: the
    name itself plus the name with character i removed, for every i.
    One narrow generate stage; output rows = sum(len(name) + 1)."""
    ident = df.withColumn(out_col, F.col(name_col))
    # Guard degenerate names: sequence(1, 0) steps BACKWARDS in Spark
    # (default step -1 when start > stop) and would yield [1, 0] for an
    # empty string, emitting a spurious i=0 variant. Empty/NULL names
    # contribute only their identity key.
    deletions = (
        df.filter(F.length(F.col(name_col)) > 0)
        .withColumn(
            "__i", F.explode(F.sequence(F.lit(1), F.length(F.col(name_col))))
        )
        .withColumn(
            out_col,
            F.concat(
                F.expr(f"substring({name_col}, 1, __i - 1)"),
                F.expr(f"substring({name_col}, __i + 1)"),
            ),
        )
        .drop("__i")
    )
    return ident.unionByName(deletions)


def fuzzy_match_dist1(
    dirty: DataFrame,
    canon: DataFrame,
    dirty_id: str,
    dirty_name: str,
    canon_name: str,
    matched_col: str = "matched_name",
    dist_col: str = "match_distance",
) -> DataFrame:
    """Resolve each dirty name to its best canonical match within edit
    distance 1 (exact-recall via deletion-neighborhood blocking).

    Returns every dirty row with ``matched_col``/``dist_col`` attached
    (NULL when nothing is within distance 1). Ties (several canonicals
    at the same distance) break deterministically by canonical name
    ascending — attach stronger secondary evidence upstream when that
    matters.
    """
    d = dirty.select(
        F.col(dirty_id).alias("__did"), F.col(dirty_name).alias("__dn")
    )
    c = canon.select(F.col(canon_name).alias("__cn")).distinct()
    dk = deletion_keys(d, "__dn")
    ck = deletion_keys(c, "__cn")
    cands = (
        dk.join(ck, "__key")
        .select("__did", "__dn", "__cn")
        .distinct()
    )
    scored = cands.withColumn("__dist", F.levenshtein("__dn", "__cn")).filter(
        F.col("__dist") <= 1
    )
    w = Window.partitionBy("__did").orderBy("__dist", "__cn")
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__did", "__cn", "__dist")
    )
    return (
        d.join(best, "__did", "left")
        .select(
            F.col("__did").alias(dirty_id),
            F.col("__dn").alias(dirty_name),
            F.col("__cn").alias(matched_col),
            F.col("__dist").cast("int").alias(dist_col),
        )
    )


# American Soundex letter codes, position-aligned with A..Z. Vowels +
# Y map to 0 (they separate runs but emit nothing); H/W map to 9 in
# NON-FIRST positions (removed BEFORE run-collapse, which is exactly
# the "same-coded letters separated by h/w collapse" rule).
_SOUNDEX_CODES = "01230129022455012623019202"


def _soundex_steps(letters_sql: str, g_flag: str) -> str:
    """The shared engine/oracle SQL pipeline from an all-letters
    uppercase string to the 4-char Soundex code. ``g_flag`` is ''
    for Spark (regexp_replace replaces all matches) and ", 'g'" for
    DuckDB (flag argument). Identical arithmetic either way."""
    first = f"substring({letters_sql}, 1, 1)"
    # first letter: true code for consonants (so a following same-coded
    # letter collapses into it — Pfister -> P236), but H/W become '0'
    # (no code of their own; must NOT vanish in the 9-removal and shift
    # the body — Hradek must keep R's 6)
    d1 = (
        f"CASE WHEN {first} IN ('H', 'W') THEN '0' "
        f"ELSE translate({first}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        f"'{_SOUNDEX_CODES}') END"
    )
    rest = (
        f"translate(substring({letters_sql}, 2), "
        f"'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_CODES}')"
    )
    d = f"replace(concat({d1}, {rest}), '9', '')"
    for c in "0123456":
        d = f"regexp_replace({d}, '{c}+', '{c}'{g_flag})"
    body = f"replace(substring({d}, 2), '0', '')"
    return (
        f"concat({first}, substring(concat({body}, '000'), 1, 3))"
    )


def soundex_expr(name_sql: str) -> "F.Column":
    """Portable American Soundex as a Spark Column (pure codegen
    string ops — translate / replace / regexp_replace — spelled
    identically in :func:`soundex_oracle_sql`, so codes replay exactly
    cross-engine; Spark's builtin ``F.soundex`` is NOT used because
    its edge-case behavior is not contractually mirrored in other
    engines). NULL/letterless names code NULL."""
    letters = f"upper(regexp_replace({name_sql}, '[^A-Za-z]', ''))"
    return F.expr(
        f"CASE WHEN length({letters}) > 0 THEN "
        + _soundex_steps(letters, "")
        + " END"
    )


def soundex_oracle_sql(name_sql: str) -> str:
    """The DuckDB text of the SAME pipeline (global regexp flags)."""
    letters = f"upper(regexp_replace({name_sql}, '[^A-Za-z]', '', 'g'))"
    return (
        f"CASE WHEN length({letters}) > 0 THEN "
        + _soundex_steps(letters, ", 'g'")
        + " END"
    )


def phonetic_match_best(
    dirty: DataFrame,
    canon: DataFrame,
    dirty_id: str,
    dirty_name: str,
    canon_name: str,
    max_dist: int = 2,
) -> DataFrame:
    """Resolve dirty names through SOUNDEX blocking + levenshtein
    verify — the phonetic complement to ``fuzzy_match_dist1``: vowel
    swaps, doubled letters, and other sound-preserving corruptions of
    ANY edit distance share the dirty name's soundex block, so they
    are candidates the distance-1 deletion neighborhood never sees.
    Candidates verify with exact ``levenshtein <= max_dist``; best
    match per dirty row by (distance, canonical name). Returns every
    dirty row with ``matched_name``/``match_distance`` (NULL = no
    phonetic match within distance).

    Scale: blocks are soundex-code-sized (vocabulary-bounded); the
    join is an equi-join on the 4-char code; never a cross join."""
    d = dirty.select(
        F.col(dirty_id).alias("__did"), F.col(dirty_name).alias("__dn")
    ).withColumn("__sdx", soundex_expr("__dn"))
    c = (
        canon.select(F.col(canon_name).alias("__cn"))
        .distinct()
        .withColumn("__sdx", soundex_expr("__cn"))
    )
    scored = (
        d.join(c, "__sdx")
        .withColumn("__dist", F.levenshtein("__dn", "__cn"))
        .filter(F.col("__dist") <= max_dist)
    )
    w = Window.partitionBy("__did").orderBy("__dist", "__cn")
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__did", "__cn", "__dist")
    )
    return (
        d.drop("__sdx")
        .join(best, "__did", "left")
        .select(
            F.col("__did").alias(dirty_id),
            F.col("__dn").alias(dirty_name),
            F.col("__cn").alias("matched_name"),
            F.col("__dist").cast("int").alias("match_distance"),
        )
    )


def edit_distance_blocked_join(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_dist: int = 1,
    block_drop: int = 2,
    report: dict | None = None,
    max_pairs: int | None = None,
) -> DataFrame:
    """Blocked Levenshtein SELF-join: every pair of rows whose names
    share the all-but-last-``block_drop``-chars prefix block and sit
    within exact edit distance ``max_dist``. Returns
    ``(id_a, id_b, name_a, name_b, dist)``, id_a < id_b.

    This is the general-distance sibling of :func:`fuzzy_match_dist1`
    (whose deletion-neighborhood blocking is exact-recall but only for
    distance 1): prefix blocking scales to any ``max_dist`` at the
    price of bounded recall — a pair differing in the PREFIX never
    candidates (the classic sorted-neighborhood trade-off, documented
    exactly like the LSH family's s-curve). Both engines verify with
    the classic Levenshtein (insert/delete/substitute cost 1; Spark
    ``F.levenshtein`` == DuckDB ``levenshtein``, checked in tests), so
    the pair set replays exactly cross-engine.

    Look-before-you-shuffle (the countjoin-guard pattern): ``report``
    receives the exact blocked candidate volume ``sum over blocks of
    C(n, 2)`` from one cheap block-histogram aggregate, and
    ``max_pairs`` refuses ABOVE budget before any self-join shuffles.
    NULL names are dropped (a NULL block key would silently vanish
    from the equi-join — the NULL-key rule)."""
    if max_dist < 0 or block_drop < 1:
        raise ValueError("max_dist must be >= 0 and block_drop >= 1")
    base = df.filter(F.col(name_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__nm"),
        F.expr(
            f"substring({name_col}, 1, "
            f"greatest(length({name_col}) - {block_drop}, 1))"
        ).alias("__blk"),
    )
    if report is not None or max_pairs is not None:
        row = (
            base.groupBy("__blk")
            .agg(F.count("*").alias("__c"))
            .agg(
                F.sum(F.expr("__c * (__c - 1) div 2"))
                .cast("bigint")
                .alias("__p")
            )
            .collect()[0]
        )
        vol = int(row["__p"] or 0)
        if report is not None:
            report["blocked_pairs"] = vol
        if max_pairs is not None and vol > max_pairs:
            raise ValueError(
                f"edit_distance_blocked_join: predicted blocked "
                f"candidate volume {vol} pairs exceeds "
                f"max_pairs={max_pairs}; widen the blocking "
                f"(raise block_drop selectivity) or raise the budget"
            )
    a = base.select(
        F.col("__id").alias("id_a"),
        F.col("__nm").alias("name_a"),
        "__blk",
    )
    b = base.select(
        F.col("__id").alias("id_b"),
        F.col("__nm").alias("name_b"),
        "__blk",
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b",
                F.col("dist").cast("int").alias("dist"))
    )


def sorted_neighborhood_join(
    df: DataFrame,
    name_col: str,
    id_col: str,
    window: int = 3,
    max_dist: int = 2,
    bucket_len: int = 4,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution SELF-join (Hernandez &
    Stolfo 1995): rank all names lexicographically, candidate every
    pair within ``window`` rank positions, verify with exact
    Levenshtein <= ``max_dist``. Returns ``(id_a, id_b, name_a,
    name_b, rank_gap, dist)``, ordered pairs by rank.

    The blocking complement of :func:`edit_distance_blocked_join`:
    prefix blocking candidates unboundedly many same-prefix rows but
    misses any prefix typo; sorted-neighborhood candidates EXACTLY
    ``n * window`` pairs (linear, no skew, no budget guard needed)
    and catches suffix/infix edits between lexicographic neighbors,
    missing pairs whose edit moves them far apart in sort order — the
    standard trade-off, usually closed by multi-pass runs over
    different sort keys (call again on ``reverse(name)``).

    Scale shape: the global rank is the repo's two-pass bucket rank
    (bucket = leading ``bucket_len`` chars, which order-aligns with
    the full name; tiny offset aggregate; per-bucket row_number — no
    single-partition window over data). The neighborhood join is an
    integer equi-join on ``rank_b == rank_a + gap`` for ``gap`` in
    ``1..window``; both engines compare ASCII names bytewise, so the
    rank permutation replays exactly in the oracle. NULL names are
    dropped (no distance is defined on NULL)."""
    if window < 1 or max_dist < 0 or bucket_len < 1:
        raise ValueError("window >= 1, max_dist >= 0, bucket_len >= 1")
    base = df.filter(F.col(name_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(name_col).alias("__nm")
    )
    dfh = base.withColumn("__b", F.substring("__nm", 1, bucket_len))
    counts = dfh.groupBy("__b").agg(F.count("*").alias("__n"))
    off_w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off")
    )
    w = Window.partitionBy("__b").orderBy("__nm", "__id")
    ranked = (
        dfh.join(F.broadcast(offsets), "__b")
        .withColumn(
            "__rk",
            F.row_number().over(w).cast("bigint") + F.col("__off"),
        )
        .select("__id", "__nm", "__rk")
    )
    a = ranked.select(
        F.col("__id").alias("id_a"),
        F.col("__nm").alias("name_a"),
        F.col("__rk").alias("__ra"),
        F.explode(
            F.array(*[F.lit(g) for g in range(1, window + 1)])
        ).alias("__gap"),
    ).withColumn("__rb", F.col("__ra") + F.col("__gap"))
    b = ranked.select(
        F.col("__id").alias("id_b"),
        F.col("__nm").alias("name_b"),
        F.col("__rk").alias("__rb"),
    )
    return (
        a.join(b, "__rb")
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select(
            "id_a", "id_b", "name_a", "name_b",
            F.col("__gap").cast("int").alias("rank_gap"),
            F.col("dist").cast("int").alias("dist"),
        )
    )

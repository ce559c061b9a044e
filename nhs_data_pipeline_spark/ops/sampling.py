"""Deterministic, key-stable sampling and dataset splitting.

A training-data pipeline cannot use RNG-state sampling (`df.sample`,
`TABLESAMPLE`): results change with partitioning, retries re-draw rows,
and a document can hop between train and test across snapshots. These
ops derive the decision from a HASH OF THE KEY, which buys:

- reproducibility: same key + salt -> same decision on any cluster,
  any partitioning, any engine (md5 is engine-portable — the DuckDB
  oracles replicate the exact expression);
- key stability: a document keeps its split assignment forever, so no
  train/test leakage when the corpus grows;
- full distribution: a pure scalar expression — codegen'd, no shuffle,
  no driver round-trip, pushes through any plan.

The bucket is the first 8 hex chars of ``md5(key || ':' || salt)``
read as a 32-bit integer — uniform over [0, 2^32); thresholds are
exact integer literals so float rounding can't flip a row between
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, 2^32) from ``md5(key ':' salt)``.
    The key is cast to string so numeric and string keys hash alike
    (and alike across engines). NULL keys hash via a NUL sentinel
    (not expressible as a cast of any real key) instead of propagating
    NULL — a NULL bucket would silently drop rows in bucket joins and
    fall through every threshold branch, concentrating NULL-key rows
    in whatever the ``otherwise`` was. All NULL keys share one bucket:
    indistinguishable keys cannot be split stably any finer."""
    k = F.col(key) if isinstance(key, str) else key
    ks = F.coalesce(k.cast("string"), F.lit("\x00"))
    h = F.md5(F.concat(ks, F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Keep rows whose key-bucket falls below ``fraction`` of the hash
    space — a reproducible Bernoulli sample keyed on ``key_col``.
    Duplicate keys are kept or dropped together (group-coherent)."""
    threshold = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(key_col, salt) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (the key-stable twin of
    ``df.sampleBy``): each stratum gets its own keep-fraction — the
    up/down-weighting move of training-data mixes (e.g. keep 100% of
    curated sources, 10% of web crawl). Strata missing from
    ``fractions`` get ``default_fraction``. Same hash-bucket decision
    as ``deterministic_sample``, so results are engine-portable and
    partitioning-independent; one codegen'd CASE chain, no shuffle."""
    bucket = hash_bucket(key_col, salt)
    expr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        thr = F.lit(int(frac * _BUCKETS))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = (
        F.lit(int(default_fraction * _BUCKETS))
        if expr is None
        else expr.otherwise(F.lit(int(default_fraction * _BUCKETS)))
    )
    return df.filter(bucket < thr_col)


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    salt: str = "s0",
) -> DataFrame:
    """Temperature-balanced stratum resampling (the multilingual-mix
    move of UNIMAX / mT5-style corpora): stratum ``s`` keeps fraction
    ``(n_min / n_s) ** (1 - alpha)`` — ``alpha=1`` keeps everything,
    ``alpha=0`` levels every stratum down to the smallest, and the
    default 0.5 square-root-flattens the head while never upsampling.

    The fractions are computed IN-PLAN: the stratum counts are a tiny
    aggregate, the global min rides in on a broadcast cross join, and
    the per-row decision is the same portable md5 bucket as
    ``deterministic_sample`` — no driver action, no RNG state, and the
    kept set is stable as the corpus grows. ``alpha=0.5`` keeps the
    whole computation on correctly-rounded IEEE ops (sqrt), so the
    decision replays bit-identically in any engine; other alphas go
    through ``pow``, whose last-ulp behavior is libm-specific (fine
    for sampling, not for an exact cross-engine oracle).
    """
    counts = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.count("*").alias("__n")
    )
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    ratio = F.col("__nmin").cast("double") / F.col("__n").cast("double")
    frac = (
        F.sqrt(ratio)
        if alpha == 0.5
        else F.pow(ratio, F.lit(1.0 - alpha))
    )
    thresholds = counts.crossJoin(F.broadcast(nmin)).select(
        "__s", F.floor(frac * F.lit(float(_BUCKETS))).cast("bigint").alias("__thr")
    )
    return (
        # Null-safe: counts has a NULL-stratum group when the data
        # does; a plain == join would silently drop every NULL-stratum
        # row instead of resampling it.
        df.join(
            F.broadcast(thresholds), df[strata_col].eqNullSafe(F.col("__s"))
        )
        .filter(hash_bucket(key_col, salt) < F.col("__thr"))
        .drop("__s", "__thr")
    )


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    token_col: str,
    budget: int,
    salt: str = "tb",
) -> DataFrame:
    """Budget-constrained mixture sampling: within each stratum, rows
    are admitted in deterministic hash order until the running token
    total would exceed ``budget`` — the "give every source at most N
    tokens" move of training-mix construction, with the same key
    stability as ``deterministic_sample`` (a document's admission only
    changes if earlier-hashed documents in its own stratum change).

    One shuffle on the stratum key; the running sum is a window
    cumulative over (hash, key) — a total order, so results are
    partitioning-independent and engine-portable. Skewed strata pay a
    per-stratum sort, which is inherent to an exact sequential budget;
    for approximate budgets at extreme skew, pre-filter with
    ``deterministic_sample`` at roughly budget/stratum_tokens first."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(hash_bucket(key_col, salt), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(token_col)).over(w)
    return df.withColumn("__run", run).filter(F.col("__run") <= budget).drop("__run")


def budget_waterfill(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    budget_num: int,
    budget_den: int,
) -> DataFrame:
    """UniMax-style token-budget allocation across sources: spread a
    total budget ``B = (sum tokens) * budget_num div budget_den``
    over the strata so that no source is over-sampled — small sources
    are CAPPED at their full token count and the remainder splits
    evenly among the large ones (the waterfilling solution of
    ``maximize min-share subject to alloc_i <= tokens_i, sum = B``).
    This is the mixture-design move of UniMax sampling (Chung et al.
    2023): epochs-capped uniform allocation beats both proportional
    (duplicates the head) and uniform (starves nothing but over-epochs
    the tail).

    Closed form, exact integers end-to-end: sort strata by
    ``(tokens ASC, key ASC)``; the capped set is always a PREFIX of
    that order (proof: if ``S_{k-1} + t_k*(n-k+1) <= B`` then the same
    holds at ``k-1``), so one window pass computes prefix sums and the
    capped flag, ``m = |capped|``, and the uncapped sources get
    ``base = (B - S_m) div u`` each (``u = n - m``), with the
    ``r = (B - S_m) mod u`` leftover distributed +1 to the LARGEST r
    (deterministic: last in sort order). ``base + 1 <= t_i`` holds for
    every uncapped source by maximality of ``m``, so allocations never
    exceed capacity. NULL strata keys are their own group and order
    under the chr(0) sentinel (identical in both engines — the
    NULLS FIRST/LAST divergence never reaches the sort).

    Returns one row per stratum: ``(strata, tokens, alloc, capped)``
    with ``sum(alloc) == min(B, sum tokens)``. Scale shape: ONE
    map-side-combinable aggregate over the corpus; every window and
    scalar cross after it runs on the strata-sized model table."""
    if budget_num < 0 or budget_den <= 0:
        raise ValueError("budget must be a non-negative rational")
    per = df.groupBy(F.col(strata_col).alias("__g")).agg(
        F.sum(F.col(token_col)).cast("bigint").alias("__t")
    )
    tot = per.agg(
        F.sum("__t").cast("bigint").alias("__tt"),
        F.count("*").cast("bigint").alias("__n"),
    )
    okey = F.coalesce(F.col("__g").cast("string"), F.lit("\x00"))
    w = Window.orderBy(F.asc("__t"), okey.asc())
    ranked = (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "__B", F.expr(f"__tt * {budget_num} div {budget_den}")
        )
        .withColumn("__k", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "__sprev",
            F.coalesce(
                F.sum("__t").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint"),
        )
        .withColumn(
            "__capped",
            F.col("__sprev") + F.col("__t") * (F.col("__n") - F.col("__k") + 1)
            <= F.col("__B"),
        )
    )
    caps = ranked.agg(
        F.coalesce(
            F.sum(F.when(F.col("__capped"), F.col("__t"))), F.lit(0)
        ).cast("bigint").alias("__Sm"),
        F.coalesce(
            F.count(F.when(F.col("__capped"), F.lit(1))), F.lit(0)
        ).cast("bigint").alias("__m"),
    )
    out = ranked.crossJoin(F.broadcast(caps)).select(
        F.col("__g").alias(strata_col),
        F.col("__t").alias("tokens"),
        F.when(F.col("__capped"), F.col("__t"))
        .otherwise(
            F.expr("(__B - __Sm) div (__n - __m)")
            + F.when(
                F.col("__k") > F.col("__n") - F.expr("(__B - __Sm) % (__n - __m)"),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("alloc"),
        F.col("__capped").alias("capped"),
    )
    return out


def capped_per_stratum(
    df: DataFrame, key_col: str, strata_col: str, k: int, salt: str = "cap"
) -> DataFrame:
    """Keep at most ``k`` rows per stratum, chosen by deterministic
    hash order — per-domain document caps (Common-Crawl-style domain
    balancing) without RNG state. One shuffle; Spark plans the
    row_number-≤-k filter as a WindowGroupLimit, so each partition
    keeps only k rows per stratum before the final window pass."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "shuf",
    prefix_len: int = 3,
    out_col: str = "shuffle_rank",
) -> DataFrame:
    """Seeded global training-order shuffle with an explicit dense rank
    0..n-1 — reproducible on any cluster, any partitioning, any engine
    (order key is ``md5(key ':' salt)``, ties broken by the key).

    A naive ``row_number() OVER (ORDER BY hash)`` funnels the whole
    table through ONE partition. This is the scalable two-pass shape:
    rows bucket by the first ``prefix_len`` hex chars of the hash
    (buckets align with the global hash order, 16^prefix_len of them),
    a tiny per-bucket count aggregate yields cumulative offsets, and
    rank = bucket offset + intra-bucket row_number — every window runs
    partitioned, nothing large is ever single-partition."""
    # NUL sentinel for NULL keys (matching hash_bucket): a NULL hash
    # would make the bucket join silently drop the row — a shuffle must
    # be row-preserving. Multiple NULL keys are indistinguishable and
    # get arbitrary-but-distinct ranks within their shared hash slot.
    h = F.md5(
        F.concat(
            F.coalesce(F.col(key_col).cast("string"), F.lit("\x00")),
            F.lit(":" + salt),
        )
    )
    dfh = df.withColumn("__h", h).withColumn("__b", F.substring(F.col("__h"), 1, prefix_len))
    counts = dfh.groupBy("__b").agg(F.count("*").alias("__n"))
    off_w = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off")
    )
    w = Window.partitionBy("__b").orderBy("__h", F.col(key_col))
    return (
        dfh.join(F.broadcast(offsets), "__b")
        .withColumn(
            out_col,
            (F.row_number().over(w).cast("bigint") - 1 + F.col("__off")),
        )
        .drop("__h", "__b", "__off")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split label ("train"/"val"/"test" by default)
    by hash-bucket range — disjoint, exhaustive, key-stable. Weights
    are normalized; the last split absorbs the rounding remainder."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    names = list(weights)
    bucket = hash_bucket(key_col, salt)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(cum * _BUCKETS)
        branch = F.when(bucket < F.lit(bound), F.lit(name))
        expr = branch if expr is None else expr.when(bucket < F.lit(bound), F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    salt: str = "fold",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    ``bucket mod k`` of the portable md5 hash — key-stable (the same
    row lands in the same fold on any engine, partitioning, or rerun;
    adding rows never moves existing ones), disjoint, exhaustive.
    Leave-one-fold-out filters are plain predicates
    (``fold != i``), so every CV split is a pushed-down scan filter,
    never a shuffle or a stored assignment table."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn(
        out_col, F.pmod(hash_bucket(key_col, salt), F.lit(k)).cast("int")
    )


def weighted_sample_ares(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    strata_col: str | None = None,
    salt: str = "w0",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-ES, public): each row draws a deterministic uniform u from the
    portable md5 hash and competes with key ``ln(u) / w`` — taking the
    k LARGEST keys selects rows with probability proportional to
    ``weight_col``, exactly the quality-/length-proportional pick a
    data-mixing pipeline needs. With ``strata_col``, top-k per
    stratum.

    Scale shape: one projection + a per-stratum WindowGroupLimit
    top-k — no global sort, no RNG state, re-runnable anywhere.
    Determinism: u is an exact rational of the 32-bit hash bucket;
    the single transcendental ``ln`` is rounded to 6 decimals before
    the division (the house rule), and ties break on the id — so the
    SELECTION replays cross-engine. The output carries only the ids,
    weights and ranks (integers), never the float key: selection
    determinism is the contract, key values are an implementation
    detail.

    Non-positive or NULL weights never win: their key is forced to
    -infinity (they rank below every positive-weight row — a FINITE
    sentinel is not a floor, since a subnormal weight like 1e-308
    yields a more-negative key; -inf rows tie and break by id) rather
    than producing a NULL key that would float to the top of a
    descending sort.
    """
    u = (hash_bucket(F.col(id_col), salt) + F.lit(1)) / F.lit(float(2**32 + 2))
    w = F.col(weight_col)
    key = F.when(
        w.isNotNull() & (w > 0), F.round(F.log(u), 6) / w
    ).otherwise(F.lit(float("-inf")))
    strata = [strata_col] if strata_col else []
    win = Window.partitionBy(*strata).orderBy(
        F.desc("__key"), F.asc(id_col)
    )
    return (
        df.select(*strata, id_col, w.alias("weight"), key.alias("__key"))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .drop("__key")
    )

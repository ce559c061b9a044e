"""Privacy risk audits over quasi-identifier columns.

Training-data pipelines that carry user-derived records need the
re-identification primitives next to the PII scanners (llm/text.pii_*):
k-anonymity (is every quasi-identifier combination shared by >= k
rows?), l-diversity (does every such class carry >= l distinct
sensitive values, so membership does not disclose the sensitive
attribute?) and t-closeness (is every class's sensitive-value
DISTRIBUTION within distance t of the global one, closing
l-diversity's skewness attack?). Sweeney's k-anonymity,
Machanavajjhala's l-diversity and Li/Li/Venkatasubramanian's
t-closeness are the published definitions these implement.

Scale shape (100 TB): one map-side-combinable ``groupBy(quasi_cols)``
aggregate builds the equivalence-class table, then one scalar
aggregate over it folds the report — no windows, no collects, no
joins. The class table can itself be corpus-scale for high-cardinality
quasi-identifiers (that is exactly the finding: the data is nearly
unique), and both passes stay fully distributed.

Cross-engine exactness: every reported number is an exact integer
count except ``risk_share`` — one double division of two exact
integers, quantized with the portable floor-round
(``floor(x*1e6 + 0.5)/1e6`` — the build-notes ROUND trap). NULL
quasi-identifier values group as values in BOTH engines (SQL GROUP BY
semantics); the sensitive column's distinct count treats NULL as one
more value via a ``chr(0)`` sentinel (the build-notes NULL-discipline
rule — a NULL sensitive value is still a disclosure class), so the
column must be string-castable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FLOOR6 = "floor({x} * 1e6 + 0.5) / 1e6"


def anonymity_classes(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """Equivalence classes under the quasi-identifier columns:
    ``(*quasi_cols, class_size)``. One map-side-combinable aggregate;
    NULL quasi values form classes like any other value."""
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("bigint").alias("class_size")
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row k-anonymity audit: ``(k, n_rows, n_classes,
    min_class_size, n_risky_classes, rows_at_risk, risk_share)``.

    A class is risky when fewer than ``k`` rows share its
    quasi-identifier combination; ``rows_at_risk`` counts the rows in
    risky classes and ``risk_share`` divides the two exact integers
    once. ``min_class_size`` is the dataset's achieved k."""
    cls = anonymity_classes(df, quasi_cols)
    risky = F.col("class_size") < F.lit(k)
    return cls.agg(
        F.lit(k).cast("int").alias("k"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum(risky.cast("bigint")).alias("n_risky_classes"),
        F.sum(F.when(risky, F.col("class_size")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
    ).withColumn(
        "risk_share",
        F.expr(
            _FLOOR6.format(
                x="cast(rows_at_risk as double) / cast(n_rows as double)"
            )
        ),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.25,
) -> DataFrame:
    """One-row (categorical, equal-ground-distance) t-closeness audit:
    ``(t, n_rows, n_classes, max_distance, n_risky_classes,
    rows_at_risk, risk_share)``.

    For a categorical sensitive attribute with equal ground distance
    the Earth Mover's Distance of Li/Li/Venkatasubramanian reduces to
    the total variation distance between the class's sensitive-value
    distribution and the global one:

        TVD = (1/2) * sum_v | c_v/n  -  g_v/N |

    (c_v/g_v = class/global counts of value v, n/N = class/table
    sizes). A class is risky when TVD > t — l-diversity's skewness
    gap: a class can hold l distinct values yet be 99% one of them.

    EXACT arithmetic throughout (the build-notes float-threshold
    trap): the TVD numerator over a common denominator 2*n*N is the
    integer ``sum_v |c_v*N - g_v*n|``; values ABSENT from the class
    contribute ``g_v*n``, folded in closed form as ``n*(N - B)`` with
    ``B = sum of g_v over values present in the class`` — no
    per-(class x value) dense cross join is ever materialized. The
    risky decision rationalizes ``t`` once (``Fraction(str(t))``) and
    compares ``den * tvd_num > num * 2 * n * N`` in DECIMAL(38,0)
    (products reach n*N ~ 1e19 at corpus scale — past BIGINT).
    ``max_distance`` is one IEEE division of identical exact integers
    per class (identical doubles cross-engine), floor-rounded at 6.

    Scale shape (100 TB): one (quasi, sentinel-NULL sensitive)
    aggregate, one quasi-keyed class-size aggregate re-joined on the
    same key (co-partitioned), the model-sized global value table
    broadcast, and one scalar fold — no windows, no collects. NULL
    sensitive values are one more category via the ``chr(0)``
    sentinel; NULL quasi values group as values.
    """
    from fractions import Fraction

    if not 0.0 <= t <= 1.0:
        raise ValueError("t must be in [0, 1]")
    frac = Fraction(str(t))
    num, den = frac.numerator, frac.denominator

    sent = F.coalesce(F.col(sensitive_col).cast("string"), F.lit("\x00"))
    # per-(class, value) exact counts — the only corpus-shaped shuffle
    cv = df.groupBy(*quasi_cols, sent.alias("__v")).agg(
        F.count("*").cast("bigint").alias("__c")
    )
    # class sizes on the same key (co-partitioned join), global value
    # counts as a broadcast model-sized table, N as a one-row scalar
    # cross (never a driver literal — oracles must derive it too)
    n_per = cv.groupBy(*quasi_cols).agg(
        F.sum("__c").cast("bigint").alias("__ncls")
    )
    g_per = cv.groupBy("__v").agg(F.sum("__c").cast("bigint").alias("__g"))
    total = g_per.agg(F.sum("__g").cast("bigint").alias("__ntot"))

    from nhs_data_pipeline_spark.ops.sketch import _ns_join

    dec = "decimal(38,0)"
    # quasi keys can be NULL (NULL groups are classes too) -> the
    # class-size re-join must be eqNullSafe or those classes vanish
    term = (
        _ns_join(cv, n_per, quasi_cols)
        .join(F.broadcast(g_per), "__v")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__dev",
            F.abs(
                F.col("__c").cast(dec) * F.col("__ntot").cast(dec)
                - F.col("__g").cast(dec) * F.col("__ncls").cast(dec)
            ),
        )
    )
    cls = term.groupBy(*quasi_cols).agg(
        F.max("__ncls").alias("__ncls"),
        F.max("__ntot").alias("__ntot"),
        F.sum("__dev").alias("__A"),
        F.sum("__g").cast(dec).alias("__B"),
    )
    tvd_num = F.col("__A") + F.col("__ncls").cast(dec) * (
        F.col("__ntot").cast(dec) - F.col("__B")
    )
    two_nn = (
        F.lit(2).cast(dec) * F.col("__ncls").cast(dec) * F.col("__ntot").cast(dec)
    )
    cls = cls.withColumn("__tnum", tvd_num).withColumn(
        "__risky",
        (F.lit(den).cast(dec) * F.col("__tnum"))
        > (F.lit(num).cast(dec) * two_nn),
    )
    dist = F.col("__tnum").cast("double") / two_nn.cast("double")
    return (
        cls.agg(
            F.lit(float(t)).cast("double").alias("t"),
            F.sum("__ncls").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_classes"),
            F.max(dist).alias("__maxd"),
            F.sum(F.col("__risky").cast("bigint")).alias("n_risky_classes"),
            F.sum(F.when(F.col("__risky"), F.col("__ncls")).otherwise(0))
            .cast("bigint")
            .alias("rows_at_risk"),
        )
        .withColumn("max_distance", F.expr(_FLOOR6.format(x="__maxd")))
        .withColumn(
            "risk_share",
            F.expr(
                _FLOOR6.format(
                    x="cast(rows_at_risk as double) / cast(n_rows as double)"
                )
            ),
        )
        .select(
            "t",
            "n_rows",
            "n_classes",
            "max_distance",
            "n_risky_classes",
            "rows_at_risk",
            "risk_share",
        )
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,  # noqa: E741 — the literature's name for the parameter
) -> DataFrame:
    """One-row (distinct) l-diversity audit: ``(l, n_rows, n_classes,
    min_diversity, n_risky_classes, rows_at_risk, risk_share)``.

    Per equivalence class, diversity is the number of DISTINCT
    sensitive values (NULL counted as one more value via the
    ``chr(0)`` sentinel); a class below ``l`` lets membership infer
    the sensitive attribute. The per-class distinct runs as the
    standard two-phase distinct aggregate — distributed, no windows."""
    sent = F.coalesce(
        F.col(sensitive_col).cast("string"), F.lit("\x00")
    )
    cls = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("bigint").alias("class_size"),
        F.count_distinct(sent).cast("bigint").alias("diversity"),
    )
    risky = F.col("diversity") < F.lit(l)
    return cls.agg(
        F.lit(l).cast("int").alias("l"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("diversity").cast("bigint").alias("min_diversity"),
        F.sum(risky.cast("bigint")).alias("n_risky_classes"),
        F.sum(F.when(risky, F.col("class_size")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
    ).withColumn(
        "risk_share",
        F.expr(
            _FLOOR6.format(
                x="cast(rows_at_risk as double) / cast(n_rows as double)"
            )
        ),
    )


def dp_group_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    salt: str = "dp0",
) -> DataFrame:
    """Differentially-private group counts via the Laplace mechanism:
    ``count + Laplace(sensitivity / epsilon)`` with sensitivity 1 (one
    row changes one group's count by one) — the standard
    privacy-preserving release for per-source/per-cohort tallies that
    k-anonymity-style suppression cannot provide a budget for.

    The noise here is DETERMINISTIC seeded inverse-CDF sampling: a
    portable md5 uniform per group (``ops/sampling.hash_bucket``, NULL
    keys via the NUL sentinel) pushed through the Laplace quantile
    function ``F^-1(u) = b*ln(2u)`` / ``-b*ln(2(1-u))``.  That makes
    the mechanism REPLAYABLE (oracle-checkable, stable across rounds)
    — the test harness for the plumbing; a production release derives
    ``salt`` from fresh entropy per publication and drops everything
    but ``noisy_count``.  The ln is quantized to integer micros
    immediately (house transcendental rule), so ``noisy_micro =
    count*1e6 + noise_micro`` is an EXACT integer cross-engine.

    100 TB shape: one group-keyed aggregate; the noise is a pure
    per-row expression on the aggregate output."""
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    from nhs_data_pipeline_spark.ops.sampling import hash_bucket

    b = repr(1.0 / epsilon)
    counts = df.groupBy(group_col).agg(F.count("*").alias("__c"))
    withu = counts.withColumn(
        "__u",
        (hash_bucket(F.col(group_col), salt).cast("double") + F.lit(0.5))
        / F.lit(4294967296.0),
    )
    noised = withu.withColumn(
        "__xm",
        F.expr(
            f"case when __u < 0.5 then"
            f" cast(floor({b} * ln(2.0 * __u) * 1e6 + 0.5) as bigint)"
            f" else"
            f" cast(floor(-({b}) * ln(2.0 * (1.0 - __u)) * 1e6 + 0.5)"
            f" as bigint) end"
        ),
    )
    return noised.select(
        group_col,
        F.expr("__c * 1000000 + __xm").alias("noisy_micro"),
        F.expr("cast(__c * 1000000 + __xm as double) / 1e6").alias(
            "noisy_count"
        ),
    )

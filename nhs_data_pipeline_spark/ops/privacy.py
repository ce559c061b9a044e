"""Privacy risk audits over quasi-identifier columns.

Training-data pipelines that carry user-derived records need the
re-identification primitives next to the PII scanners (llm/text.pii_*):
k-anonymity (is every quasi-identifier combination shared by >= k
rows?) and l-diversity (does every such class carry >= l distinct
sensitive values, so membership does not disclose the sensitive
attribute?). Sweeney's k-anonymity and Machanavajjhala's l-diversity
are the published definitions these implement.

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

"""Distributed PCA via power iteration, bit-exact cross-engine.

Embedding-curation pipelines need principal components constantly —
whitening before SemDeDup, low-rank projection ahead of ANN, drift
monitoring on the spectrum — and the usual route (collect a sample,
numpy ``eigh`` on the driver) neither scales nor replays in another
engine. This module fits the top components *inside the engine* as
ordinary Catalyst plans, in two phases:

    moments:  ONE corpus scan.  Vectors are quantized to integer
              micro-units, then the (dim_i, dim_j) Gram sums and the
              per-dim sums aggregate as exact integers (order-free —
              no float accumulation anywhere near the data).  The
              64x64 covariance assembles from those moments in a
              handful of identically-spelled double ops.
    iterate:  classic power iteration on the MODEL-sized covariance
              table: matvec (64x64 join, dim-ordered fold), L2
              normalize, ``iterations`` rounds, Rayleigh-quotient
              eigenvalue, then Hotelling deflation
              ``C' = C - lambda v v^T`` for the next component.

Scale shape (100 TB): the corpus is touched exactly once, exploded to
(i, j, x_i*x_j) with map-side partial aggregation onto dim^2 keys —
the standard distributed Gram computation; everything after operates
on 64- and 4096-row model tables (localCheckpoint per round, the
iterative-loop lineage rule — see llm/cluster.py, ops/graph.py).

Cross-engine determinism (how an iterative float algorithm stays
hash-exact)
-----------
- Inputs quantize ONCE to integer micro-units with the portable
  floor-round; all second moments are INTEGER sums cast to
  DECIMAL(38,0) — exact and order-free, so no sorted fold is needed
  on the corpus-sized path.
- The covariance entries, matvec terms, norms and Rayleigh quotients
  fold in *dimension order* (Spark ``aggregate`` over a sorted
  ``collect_list`` == DuckDB ``list_reduce`` over the dim-ordered
  list) — identical IEEE sequences.
- ``sqrt`` is IEEE correctly-rounded in every engine; divisions
  happen once per value.  The whole trajectory is therefore a
  deterministic function of the data, and the oracle replays it as an
  unrolled CTE chain (``embed_pca_power``) — the kmeans pattern.

Convergence note: ``iterations`` power rounds give the dominant
eigenvector up to O((lambda_2/lambda_1)^T) error — the fit is
approximate like any iterative trainer, but *identically* approximate
in every engine.  tests/test_llm.py checks the converged fit against
a numpy ``eigh`` replica on the same quantized moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# dim-ordered left fold of __t keyed by __k: the portable sum for
# model-sized float tables (== DuckDB list_reduce over ORDER BY __k)
_FOLD = (
    "aggregate(transform(sort_array(collect_list(struct(__k, __t))), "
    "s -> s.__t), cast(0.0 as double), (a, x) -> a + x)"
)


def _quantized_micro(df: DataFrame, vec_col: str) -> DataFrame:
    """(__xm): float32 -> double (exact) -> integer micro-units via
    the portable floor-round, once, before any aggregation."""
    return df.select(
        F.expr(
            f"transform({vec_col}, v -> "
            "cast(floor(cast(v as double) * 1e6 + 0.5) as bigint))"
        ).alias("__xm")
    )


def covariance_table(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(__i, __j, __c): the exact-moment covariance of the quantized
    vectors — ``E[x_i x_j] - E[x_i] E[x_j]`` assembled from integer
    sums in identically-spelled double arithmetic.

    One corpus scan: the double explode pipelines into a partial
    aggregate on dim^2 keys (no corpus-sized shuffle — the shuffle
    carries dim^2 rows per map partition)."""
    ex = (
        _quantized_micro(df, vec_col)
        .select("__xm", F.posexplode("__xm").alias("__i", "__xi"))
        .select("__i", "__xi", F.posexplode("__xm").alias("__j", "__xj"))
    )
    gram = ex.groupBy("__i", "__j").agg(
        F.expr("sum(cast(__xi * __xj as decimal(38,0)))").alias("__g"),
        F.count("*").alias("__n"),
    )
    sums = (
        _quantized_micro(df, vec_col)
        .select(F.posexplode("__xm").alias("__d", "__x"))
        .groupBy("__d")
        .agg(
            F.expr("sum(cast(__x as decimal(38,0)))").alias("__s"),
            F.count("*").alias("__cn"),
        )
    )
    a = sums.select(
        F.col("__d").alias("__ai"), F.col("__s").alias("__as"),
        F.col("__cn").alias("__an"),
    )
    b = sums.select(
        F.col("__d").alias("__bj"), F.col("__s").alias("__bs"),
        F.col("__cn").alias("__bn"),
    )
    return (
        gram.join(F.broadcast(a), gram["__i"] == a["__ai"])
        .join(F.broadcast(b), gram["__j"] == b["__bj"])
        .select(
            "__i",
            "__j",
            F.expr(
                "cast(__g as double) / cast(__n as double) / 1e12"
                " - (cast(__as as double) / cast(__an as double) / 1e6)"
                " * (cast(__bs as double) / cast(__bn as double) / 1e6)"
            ).alias("__c"),
        )
    )


def _matvec(cov: DataFrame, v: DataFrame) -> DataFrame:
    """(__d, __w) = C v with the dim-ordered fold (column __k = j)."""
    return (
        cov.join(F.broadcast(v), cov["__j"] == v["__d"])
        .select(
            cov["__i"],
            F.col("__j").alias("__k"),
            (F.col("__c") * F.col("__val")).alias("__t"),
        )
        .groupBy("__i")
        .agg(F.expr(_FOLD).alias("__w"))
        .select(F.col("__i").alias("__d"), "__w")
    )


def _scalar_cross(df: DataFrame, scalar: DataFrame) -> DataFrame:
    """Audited scalar-broadcast cross join (one-row right side)."""
    return df.crossJoin(F.broadcast(scalar))


def power_pca(
    df: DataFrame,
    dim: int = 64,
    n_pc: int = 2,
    iterations: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top ``n_pc`` principal components of the vector column by
    power iteration with Hotelling deflation.

    Returns the LONG-FORM model (pc, dim, component, eigenvalue,
    explained_ratio) — one row per component dimension (the shape the
    driver's array-blind canonicalizer needs; see label_centroids).
    Components are sign-canonicalized (the largest-|coordinate| entry
    is made positive, ties to the lowest dim) and floor-rounded to 6
    decimals; ``explained_ratio`` is lambda over the covariance trace.
    """
    spark = df.sparkSession
    cov = covariance_table(df, vec_col).localCheckpoint(eager=False)
    cov.count()

    trace = (
        cov.filter(F.col("__i") == F.col("__j"))
        .select(F.col("__i").alias("__k"), F.col("__c").alias("__t"))
        .agg(F.expr(_FOLD).alias("__tr"))
    )

    outs: list[DataFrame] = []
    for p in range(n_pc):
        v = spark.range(dim).select(
            F.col("id").cast("int").alias("__d"), F.lit(1.0).alias("__val")
        )
        for _ in range(iterations):
            w = _matvec(cov, v)
            nrm = w.select(
                F.col("__d").alias("__k"),
                (F.col("__w") * F.col("__w")).alias("__t"),
            ).agg(F.sqrt(F.expr(_FOLD)).alias("__nrm"))
            v = _scalar_cross(w, nrm).select(
                "__d", (F.col("__w") / F.col("__nrm")).alias("__val")
            )
            # 64-row model table; truncate the unrolled lineage (A/B
            # measured: every-2nd checkpoint saves nothing — ~8.7 s
            # either way at sf0.1 — and NO checkpoint explodes the
            # deflation lineage exponentially and never finishes, so
            # the simple per-round recipe stands)
            v = v.localCheckpoint(eager=False)
            v.count()

        cv = _matvec(cov, v)
        lam = (
            v.join(F.broadcast(cv), "__d")
            .select(
                F.col("__d").alias("__k"),
                (F.col("__val") * F.col("__w")).alias("__t"),
            )
            .agg(F.expr(_FOLD).alias("__lam"))
        )

        w_sign = Window.orderBy(F.abs(F.col("__val")).desc(), F.col("__d").asc())
        sgn = (
            v.withColumn("__rk", F.row_number().over(w_sign))
            .filter(F.col("__rk") == 1)
            .select(
                F.when(F.col("__val") < 0, F.lit(-1.0))
                .otherwise(F.lit(1.0))
                .alias("__sg")
            )
        )
        out = _scalar_cross(_scalar_cross(_scalar_cross(v, lam), sgn), trace).select(
            F.lit(p).cast("int").alias("pc"),
            F.col("__d").cast("int").alias("dim"),
            F.expr("floor(__val * __sg * 1e6 + 0.5) / 1e6").alias("component"),
            F.expr("floor(__lam * 1e6 + 0.5) / 1e6").alias("eigenvalue"),
            F.expr("floor(__lam / __tr * 1e6 + 0.5) / 1e6").alias(
                "explained_ratio"
            ),
        )
        outs.append(out)

        if p + 1 < n_pc:
            # Hotelling deflation: C' = C - lambda v v^T (model-sized)
            vi = v.select(F.col("__d").alias("__di"), F.col("__val").alias("__vi"))
            vj = v.select(F.col("__d").alias("__dj"), F.col("__val").alias("__vj"))
            cov = (
                _scalar_cross(cov, lam)
                .join(F.broadcast(vi), F.col("__i") == F.col("__di"))
                .join(F.broadcast(vj), F.col("__j") == F.col("__dj"))
                .select(
                    "__i",
                    "__j",
                    (
                        F.col("__c")
                        - F.col("__lam") * F.col("__vi") * F.col("__vj")
                    ).alias("__c"),
                )
                .localCheckpoint(eager=False)
            )
            cov.count()

    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def pca_scores_by_label(
    df: DataFrame,
    label_col: str = "label",
    dim: int = 64,
    n_pc: int = 2,
    iterations: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Consume the :func:`power_pca` fit at corpus scale: project
    every vector onto each fitted component and report per-label
    score statistics ``(pc, label, n_vectors, mean_score, var_score)``
    — the class structure along the principal axes (components that
    separate label means are the ones a linear probe uses; a variance
    collapse along PC1 is the re-embedding drift alarm).

    The fit's model table re-packs into one array per component
    (model-sized sorted collect); the projection is a pure per-row
    zip_with fold against that broadcast 2-row table — no shuffle, no
    UDF, pipelined into the scan.  Scores quantize to integer
    micro-units immediately (the transcendental-free version of the
    house rule), so the per-label mean/variance assemble from exact
    integer sums with single divisions — bit-identical cross-engine.
    """
    model = power_pca(
        df, dim=dim, n_pc=n_pc, iterations=iterations, vec_col=vec_col
    )
    comp = model.groupBy("pc").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(dim, component))), "
            "s -> s.component)"
        ).alias("__comp")
    )
    # NULL / short embeddings: the DuckDB oracle's unnest path drops
    # such rows from BOTH count and sums, while count(*) here would
    # keep them and deflate mean/var (r8 ADVICE medium). Mirror
    # exact_knn's defensive filter so a future data regeneration with
    # NULL embeddings cannot split the engines.
    xq = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(
        F.col(label_col).alias("__lb"),
        F.expr(
            f"transform({vec_col}, v -> "
            "floor(cast(v as double) * 1e6 + 0.5) / 1e6)"
        ).alias("__xq"),
    )
    D = "decimal(38,0)"
    scored = xq.crossJoin(F.broadcast(comp)).select(
        "pc",
        "__lb",
        F.expr(
            "cast(floor(aggregate(zip_with(__xq, __comp, "
            "(a, b) -> a * b), cast(0.0 as double), "
            "(__a, __x) -> __a + __x) * 1e6 + 0.5) as bigint)"
        ).alias("__sm"),
    )
    agg = scored.groupBy("pc", "__lb").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.sum(F.col("__sm").cast(D)).alias("__s"),
        F.sum(F.col("__sm").cast(D) * F.col("__sm").cast(D)).alias("__q"),
    )
    mean_d = F.col("__s").cast("double") / F.col("n_vectors").cast("double")
    return agg.select(
        F.col("pc").cast("int").alias("pc"),
        F.col("__lb").alias(label_col),
        "n_vectors",
        (F.floor(mean_d + F.lit(0.5)) / F.lit(1e6)).alias("mean_score"),
        (
            F.floor(
                (
                    F.col("__q").cast("double")
                    / F.col("n_vectors").cast("double")
                    - mean_d * mean_d
                )
                / F.lit(1e12)
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("var_score"),
    )

"""Iterative graph analytics: weighted PageRank over an edge table.

The org-change subsystem already ships one iterative-closure algorithm
(orgchange/closure.py — successor chains). This module adds the other
canonical iterative graph primitive a data-curation stack needs:
*link-analysis centrality*. Public pipelines use PageRank-family
scores over hyperlink graphs (Common Crawl's harmonic-centrality
ranking) to up-weight well-linked sources; the same operator ranks any
``(src, dst, weight)`` edge table — citation graphs, org-successor
graphs, near-duplicate clusters.

Spark-first shape (100 TB design)
---------------------------------
- The graph stays a *distributed edge table*; ranks are a ``(node,
  pr)`` table. One iteration = join(edges, ranks on src) ->
  groupBy(dst) -> rejoin the node set. Nothing is ever collected to
  the driver; a billion-edge graph iterates exactly like this 25-node
  one.
- Fixed iteration count (default 5): each iteration adds two shuffles
  (join on src is co-partitioned with the previous groupBy; the
  aggregate shuffles on dst). Each iteration's rank table is
  ``localCheckpoint``ed (lazy) + count()-materialized — same
  discipline as orgchange/closure.py. A plain persist is NOT enough
  here: it caches data but leaves the unrolled logical plan in place,
  so per-iteration Catalyst analysis cost compounds superlinearly
  (measured: a 20-iteration loop crawled under persist, constant-time
  under checkpoint).
- Dangling nodes (no out-edges) contribute no redistributed mass
  (the standard "ignore dangling mass" simplification — documented,
  deterministic); nodes with no in-edges get the teleport term.

Cross-engine determinism
------------------------
Per-edge contributions ``pr(src) * w / outw(src)`` are IEEE-identical
given identical inputs (integer weights, one division); the per-node
sum folds contributions in *src order* via the sorted-array
``aggregate``, and each iteration's rank rounds to 9 decimals — so
every iteration's rank table is bit-identical in any engine (DuckDB
replays with ``list_reduce(list(contrib ORDER BY src))``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank after ``iterations`` synchronous rounds:
    ``(node, pr)`` with uniform ``1/N`` initial ranks and

        pr'(v) = round((1-d)/N + d * sum_{(u,v) in E}
                       pr(u) * w(u,v) / outw(u), 9)

    where the sum folds in ``u`` order (bit-reproducible — module
    docstring). ``edges`` may carry parallel edges; they are
    pre-aggregated on (src, dst).
    """
    # NULL endpoints would form a NULL node that silently drops out of
    # the src equi-joins while still absorbing teleport mass (the
    # NULL-key trap in the build notes) — a link with an unknown
    # endpoint is not an edge; drop it up front.
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .groupBy(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .agg(F.sum(weight).alias("w"))
        .persist()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # also materializes the persists above
    teleport = F.lit((1.0 - damping) / n)

    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            e.join(outw, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                "src",
                (F.col("pr") * F.col("w") / F.col("ow")).alias("__c"),
            )
        )
        summed = (
            contribs.groupBy("node")
            .agg(F.sort_array(F.collect_list(F.struct("src", "__c"))).alias("__st"))
            .withColumn(
                "__s",
                F.expr(
                    "aggregate(transform(__st, __x -> __x.__c), "
                    "cast(0.0 as double), (__a, __b) -> __a + __b)"
                ),
            )
        )
        ranks = (
            nodes.join(summed.select("node", "__s"), "node", "left")
            .select(
                "node",
                F.round(
                    teleport + F.lit(damping) * F.coalesce("__s", F.lit(0.0)), 9
                ).alias("pr"),
            )
            # truncate the unrolled plan each round (module docstring);
            # the count() materializes the checkpoint
            .localCheckpoint(eager=False)
        )
        ranks.count()
    e.unpersist()
    nodes.unpersist()
    return ranks

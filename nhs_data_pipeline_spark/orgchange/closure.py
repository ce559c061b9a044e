"""Successor transitive closure + change classification (J3, A2).

The reference resolves NHS trust succession chains (old_code -> ... ->
final_code, with splits fanning one-to-many) by an iterative in-memory
loop (scripts/org-changes/build_trust_lookup.R:59-84,
build_all_org_changes.R:55-106). Spark has no recursive CTE, so the
engine runs a driver-side loop of self-joins: each iteration advances
every unresolved frontier code by one hop. Splits are handled by join
multiplicity (one row fans to N) — no explode needed.

Scale notes: iterations = longest chain length (NHS data: <= ~4); each
iteration is one broadcast-able join against the (small) edge list;
``localCheckpoint`` truncates lineage so plans don't grow per iteration.
With a *large* edge list this becomes pointer-doubling territory, but
succession graphs are lookup-sized — broadcast join is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def successor_closure(
    edges: DataFrame,
    old: str = "old_code",
    new: str = "new_code",
    max_iter: int = 20,
    checkpoint: bool = True,
    probe_every: int = 2,
) -> DataFrame:
    """Resolve every ``old`` code to its terminal successor(s).

    ``edges`` is the one-hop succession list. Returns ``(old, final_code,
    n_hops)`` — one row per (origin, terminal) pair; splits yield multiple
    rows per origin. Cycles are cut by ``max_iter``.

    Parity: build_trust_lookup.R:59-84 (the ``while (length(repl) > 0)``
    loop); build_all_org_changes.R:55-106 (bounded per-hop variant).
    """
    e = edges.select(F.col(old).alias("__o"), F.col(new).alias("__n")).distinct()
    mapping = e.select(
        F.col("__o").alias(old),
        F.col("__n").alias("final_code"),
        F.lit(1).alias("n_hops"),
    )
    hop = e.select(F.col("__o").alias("__ho"), F.col("__n").alias("__hn"))

    def _advance(m: DataFrame) -> DataFrame:
        return (
            m.join(F.broadcast(hop), m["final_code"] == hop["__ho"], "left")
            .select(
                old,
                F.coalesce("__hn", "final_code").alias("final_code"),
                F.when(F.col("__hn").isNotNull(), F.col("n_hops") + 1)
                .otherwise(F.col("n_hops"))
                .alias("n_hops"),
                F.col("__hn").isNotNull().alias("__moved"),
            )
            # dedup + flag-merge in one aggregate (a plain distinct would
            # keep (row, moved) and (row, not-moved) as separate rows)
            .groupBy(old, "final_code", "n_hops")
            .agg(F.max("__moved").alias("__moved"))
        )

    # One Spark action per PROBE: ``probe_every`` step joins run
    # between convergence checks (the last step's __moved flag answers
    # convergence — if hop k+1 moved nothing, the fixpoint is reached
    # regardless of hop k), a lazy localCheckpoint truncates lineage,
    # and the single count() both materializes the checkpoint and
    # answers convergence. Driver-loop job latency — not join work —
    # dominates on lookup-sized graphs (the r04 official bench record
    # inflated this query 7.6x under host load), so halving the action
    # count halves the latency exposure; the extra post-fixpoint join
    # per probe window is a no-op aggregate on a lookup-sized table.
    it = 0
    while it < max_iter:
        advanced = _advance(mapping)
        it += 1
        while it % max(1, probe_every) != 0 and it < max_iter:
            advanced = _advance(advanced.drop("__moved"))
            it += 1
        if checkpoint:
            advanced = advanced.localCheckpoint(eager=False)
        moved = advanced.filter("__moved").limit(1).count()
        mapping = advanced.drop("__moved")
        if moved == 0:
            break
    return mapping


def classify_changes(edges: DataFrame, old: str = "old_code", new: str = "new_code") -> DataFrame:
    """Classify each one-hop change as merger / name_change / split.

    A successor reached by exactly one distinct predecessor is a name
    change; by several, a merger. An origin with several distinct
    successors is a split (takes precedence, matching the reference's
    split handling). Parity: build_all_org_changes.R:136-198.

    Returns ``(old, new, change_type)``.
    """
    e = edges.select(old, new).distinct()
    by_new = e.groupBy(new).agg(F.countDistinct(old).alias("n_preds"))
    by_old = e.groupBy(old).agg(F.countDistinct(new).alias("n_succs"))
    return (
        e.join(F.broadcast(by_new), new, "left")
        .join(F.broadcast(by_old), old, "left")
        .select(
            old,
            new,
            F.when(F.col("n_succs") > 1, "split")
            .when(F.col("n_preds") > 1, "merger")
            .otherwise("name_change")
            .alias("change_type"),
        )
    )

"""Product quantization (PQ) for billion-scale ANN over embeddings.

Brute-force cosine (llm/similarity.py) reads every full vector per
query; IVF (ibid.) prunes candidates but still stores full vectors.
At 100 TB of embeddings the working set itself is the problem: PQ
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — the index behind FAISS IVFPQ) compresses each vector to
M small codes by splitting it into M subspaces and vector-quantizing
each against a per-subspace codebook, then answers queries with
asymmetric distance computation (ADC): a query precomputes an M x K
table of query-to-centroid distances and each database vector's
distance is just M table lookups — the scan reads codes (M bytes),
never floats.

Reference scope: the reference engine ships no ANN at all; this
module extends the similarity family (SURVEY §2.12) with the standard
compressed-index path, alongside brute/LSH/IVF.

Spark-first shape (100 TB design)
---------------------------------
- The corpus-sized table is ``(vec_id, m, qv)`` subvectors, then
  ``(vec_id, m, cid)`` codes. Codebooks and ADC tables are
  model-sized (M x K x sub_dim) and ALWAYS broadcast; training's only
  corpus shuffle is the (m, cid, dim) partial-aggregated mean. The
  ADC scan is: broadcast-join codes to the M x K distance table, one
  map-side-combined sum per vector — no shuffle carries floats.
- Lloyd refinement follows the r5 trainer recipe: the corpus-sized
  subvector table persists ONCE per call (unpersisted on return), the
  model-sized codebook materializes per round, and scalar/model
  tables broadcast — never driver literals.

Cross-engine determinism (zero float discipline)
------------------------------------------------
Coordinates integerize to millionths at ingest (the build-notes
transcendental/quantize-immediately rule): every distance is then an
EXACT BIGINT sum of squared integer differences, every argmin an
exact integer comparison with smallest-centroid tie-break, and the
Lloyd mean is ONE documented IEEE division of exact integers +
portable floor-round. The full fit-encode-query pipeline is
bit-identical in any engine — the DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantized_subvectors(
    emb: DataFrame,
    m_sub: int = 8,
    sub_dim: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(vec_id, m, qv)``: the vector split into ``m_sub`` subspaces
    of ``sub_dim`` dims, each coordinate integerized to millionths
    (CAST(floor(x*1e6 + 0.5) AS BIGINT) — the portable floor-round).
    One projection in the scan stage; no shuffle."""
    slices = F.array(
        *[
            F.expr(
                f"transform(slice({vec_col}, {m * sub_dim + 1}, {sub_dim}), "
                f"x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"
            )
            for m in range(m_sub)
        ]
    )
    return emb.select(
        F.col(id_col).alias("vec_id"), F.posexplode(slices).alias("m", "qv")
    )


def _sqdist(left_qv: str, right_qv: str) -> F.Column:
    """Exact BIGINT squared L2 distance between two integer subvectors
    (same-length arrays) — aggregate of squared differences, folded in
    dimension order (integers: order-free anyway)."""
    return F.expr(
        f"aggregate(zip_with({left_qv}, {right_qv}, (a, b) -> (a - b) * (a - b)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _assign(sub: DataFrame, centroids: DataFrame) -> DataFrame:
    """Per (vec_id, m): the nearest centroid id, exact-integer argmin
    with smallest-cid tie-break. The codebook is broadcast; the join
    key is the subspace index (fan-out K per row, map-side only)."""
    c = F.broadcast(
        centroids.select(F.col("m"), F.col("cid"), F.col("qv").alias("cqv"))
    )
    return (
        sub.join(c, "m")
        .select(
            "vec_id",
            "m",
            F.struct(_sqdist("qv", "cqv").alias("dist"), F.col("cid")).alias("dc"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min("dc").alias("best"))
        .select("vec_id", "m", F.col("best.cid").alias("cid"))
    )


def pq_train(sub: DataFrame, k: int, rounds: int = 1) -> DataFrame:
    """Per-subspace codebooks ``(m, cid, qv)`` after ``rounds`` Lloyd
    refinements from a deterministic init (the subvectors of vec_ids
    0..k-1). The Lloyd mean is floor(sum/count + 0.5) on exact integer
    sums — order-free, one IEEE division; cells that capture no
    vectors keep their previous centroid (coalesce against the
    spine). ``sub`` should already be persisted by the caller (it is
    re-read every round plus at encode)."""
    centroids = sub.filter(F.col("vec_id") < k).select(
        "m", F.col("vec_id").cast("bigint").alias("cid"), "qv"
    )
    for _ in range(rounds):
        asg = _assign(sub, centroids)
        dims = (
            asg.join(sub, ["vec_id", "m"])
            .select("m", "cid", F.posexplode("qv").alias("i", "v"))
            .groupBy("m", "cid", "i")
            .agg(F.sum("v").alias("s"), F.count("*").alias("cnt"))
            .select(
                "m",
                "cid",
                "i",
                F.expr(
                    "CAST(floor(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) + 0.5) "
                    "AS BIGINT)"
                ).alias("mv"),
            )
        )
        spine = centroids.select(
            "m", "cid", F.posexplode("qv").alias("i", "old_v")
        )
        merged = (
            spine.join(dims, ["m", "cid", "i"], "left")
            .select("m", "cid", "i", F.coalesce("mv", "old_v").alias("v"))
            .groupBy("m", "cid")
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(i, v))), p -> p.v)"
                ).alias("qv")
            )
        )
        centroids = merged.localCheckpoint(eager=False)
        centroids.count()
    return centroids


def pq_encode(sub: DataFrame, centroids: DataFrame) -> DataFrame:
    """``(vec_id, m, cid)`` codes under a trained codebook — the
    compressed representation the 100 TB scan stores (M bytes per
    vector at K<=256)."""
    return _assign(sub, F.broadcast(centroids))


def adc_topk(
    codes: DataFrame,
    centroids: DataFrame,
    query_sub: DataFrame,
    k_top: int,
) -> DataFrame:
    """Asymmetric-distance top-k: precompute the query's M x K
    distance table (model-sized, broadcast), look each code up, sum
    per vector — EXACT integer ADC distances, deterministic
    (adc, vec_id) order. The scan never touches a float."""
    dt = (
        centroids.join(
            F.broadcast(query_sub.select("m", F.col("qv").alias("q_qv"))), "m"
        )
        .select("m", "cid", _sqdist("qv", "q_qv").alias("d"))
    )
    return (
        codes.join(F.broadcast(dt), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("d").cast("bigint").alias("adc"))
        .orderBy("adc", "vec_id")
        .limit(k_top)
    )

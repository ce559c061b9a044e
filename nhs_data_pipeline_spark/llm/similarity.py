"""Similarity search over embedding columns (``array<float>``).

Two paths:

- ``brute_force_topk``: exact cosine top-k. The dot product is a native
  ``zip_with``/``aggregate`` expression (JVM-side, no UDF); norms are
  precomputed once per side. Cost is |Q| x |N| — the correctness
  baseline and the right plan when one side is small enough to
  broadcast.
- ``lsh_topk``: random-hyperplane LSH. Each vector gets a ``num_bits``
  sign signature against a fixed seeded Gaussian projection; candidates
  = vectors sharing a signature band; exact cosine re-ranks candidates.
  Sub-quadratic: at 100 TB the banded join shuffles ids+buckets, and
  only bucket-mates ever compute a dot product.

Vectors are cast to double before arithmetic so results match a
double-precision oracle bit-for-bit modulo rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    """Cosine similarity between two double-array columns; NULL when
    either norm is 0."""
    av, bv = F.col(a), F.col(b)
    na, nb = _norm(av), _norm(bv)
    return df.withColumn(
        out,
        F.when((na == 0) | (nb == 0), F.lit(None)).otherwise(_dot(av, bv) / (na * nb)),
    )


def _as_double(df: DataFrame, vec: str) -> DataFrame:
    return df.withColumn(vec, F.col(vec).cast("array<double>"))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Returns ``(query_id, neighbor_id, rank,
    cosine)``; ties broken by neighbor id for determinism.

    The query side is broadcast (top-k search with a small query set is
    the common shape); swap sides upstream if the corpus is the small
    one."""
    q = _as_double(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
    ).withColumn("__qn", _norm(F.col("__qv")))
    c = _as_double(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
    ).withColumn("__cn", _norm(F.col("__cv")))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.when((F.col("__qn") == 0) | (F.col("__cn") == 0), F.lit(None)).otherwise(
                _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, num_bits: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side constants,
    broadcast into the plan as literals)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_bits)]


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of ``vec`` against fixed hyperplanes, packed
    into a long. Native expressions only."""
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(w) for w in plane])
        bit = (_dot(vec, lit_plane) > 0).cast("long")
        acc = acc + F.shiftleft(bit, i)
    return acc


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_bits: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH banding.

    ``num_bits`` sign bits split into ``bands`` bands; vectors sharing
    any band are candidates; exact cosine re-ranks. Recall rises with
    bands (OR-construction). Same output shape as ``brute_force_topk``
    (rank may hold fewer than k rows when buckets are sparse)."""
    planes = _hyperplanes(dim, num_bits, seed)
    bits_per_band = num_bits // bands

    def banded(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        d = _as_double(
            df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias)),
            vec_alias,
        ).withColumn("__sig", signature_bits(F.col(vec_alias), planes))
        return d.select(
            id_alias,
            vec_alias,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band_idx"),
                            F.shiftright("__sig", i * bits_per_band)
                            .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                            .alias("band_val"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("b"),
        ).select(id_alias, vec_alias, "b.band_idx", "b.band_val")

    qb = banded(queries, "query_id", "__qv")
    cb = banded(corpus, "neighbor_id", "__cv")
    cand = (
        qb.join(cb, ["band_idx", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "__qv", "neighbor_id", "__cv")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", _dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_bits: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 7,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all ``(id_a, id_b)`` with
    ``id_a < id_b`` and exact cosine >= ``threshold``.

    Scale path (default): random-hyperplane LSH banding blocks the
    quadratic pair space — the banded self-join shuffles only
    ``(id, band_idx, band_val)`` triples (no vectors), candidate pairs
    are distinct'd as bare id pairs, and vectors are joined back only
    for surviving candidates before the exact-cosine filter. At a
    near-dup threshold of ~0.9 (angle ~26 deg) the default 16-bit /
    4-band config collides true pairs in some band with p ~ 0.95;
    recall is property-tested in tests/test_llm.py.

    ``exact=True`` switches to the brute-force O(n^2) self-join — the
    correctness baseline, and the right plan when one side fits in a
    broadcast.

    Reference parity: the reference has no embedding ops; this extends
    its dedup family (exact / MinHash / SimHash / Jaccard) with the
    embedding-cosine variant a training-data pipeline needs.
    """
    vecs = _as_double(
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")), "__v"
    )
    if exact:
        a = vecs.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
        b = vecs.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        planes = _hyperplanes(dim, num_bits, seed)
        bits_per_band = num_bits // bands
        banded = (
            vecs.withColumn("__sig", signature_bits(F.col("__v"), planes))
            .select(
                "__id",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("band_idx"),
                                F.shiftright("__sig", i * bits_per_band)
                                .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                                .alias("band_val"),
                            )
                            for i in range(bands)
                        ]
                    )
                ).alias("b"),
            )
            .select("__id", "b.band_idx", "b.band_val")
        )
        # eager persist: the banded table feeds both sides of the
        # self-join; lazy persist would race and compute signatures twice
        banded = banded.persist()
        banded.count()
        qa = banded.select(
            F.col("__id").alias("id_a"), "band_idx", "band_val"
        )
        qb = banded.select(
            F.col("__id").alias("id_b"), "band_idx", "band_val"
        )
        ids = (
            qa.join(qb, ["band_idx", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        cand = ids.join(
            vecs.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va")), "id_a"
        ).join(
            vecs.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb")), "id_b"
        )
    na, nb = _norm(F.col("__va")), _norm(F.col("__vb"))
    return (
        cand.withColumn(
            "cosine",
            F.when((na == 0) | (nb == 0), F.lit(None)).otherwise(
                _dot(F.col("__va"), F.col("__vb")) / (na * nb)
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 11,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means cells + multi-probe.

    Build: fit KMeans centroids (driver-side model over the corpus —
    centroid count is tiny; the fit itself is distributed), assign each
    corpus vector to its nearest cell (one shuffle-free transform).
    Query: score each query against the centroid table (literal arrays,
    n_centroids dot products), keep the ``n_probe`` nearest cells,
    join corpus rows in those cells, exact-cosine re-rank.

    Scale shape: the candidate join is keyed on cell id — the shuffle
    carries (id, cell) pairs and only same-cell vectors meet; recall is
    tuned by ``n_probe`` (probing all cells == brute force). Compared
    to ``lsh_topk`` this adapts to the data's cluster structure at the
    cost of a training pass.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = _as_double(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
    ).withColumn("__vec", array_to_vector("__cv"))
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__vec", predictionCol="__cell")
    model = km.fit(c)
    cells = model.transform(c).select("neighbor_id", "__cv", "__cell")

    centers = [[float(x) for x in ctr] for ctr in model.clusterCenters()]
    q = _as_double(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
    )
    # distance to each centroid as literal-array dot products; keep the
    # n_probe nearest cells per query
    scored_cells = q.select(
        "query_id",
        "__qv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("__cell"),
                        _dot(
                            F.col("__qv"), F.array(*[F.lit(w) for w in ctr])
                        ).alias("__sim"),
                    )
                    for i, ctr in enumerate(centers)
                ]
            )
        ).alias("s"),
    ).select("query_id", "__qv", "s.__cell", "s.__sim")
    w_probe = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("__cell"))
    probes = (
        scored_cells.withColumn("__pr", F.row_number().over(w_probe))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "__qv", "__cell")
    )

    cand = probes.join(cells, "__cell").filter(F.col("query_id") != F.col("neighbor_id"))
    rescored = cand.withColumn(
        "cosine",
        _dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )

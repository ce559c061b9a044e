"""Product quantization (llm/pq.py): exact-integer PQ fit / encode /
ADC behavior on hand-computed vectors, Lloyd-mean rounding, empty-cell
coalesce, and partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from nhs_data_pipeline_spark.llm import pq


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_quantized_subvectors_shape_and_values(spark):
    emb = _emb(spark, [[0.5] * 16])
    sub = pq.quantized_subvectors(emb, m_sub=2, sub_dim=8)
    rows = {r.m: r.qv for r in sub.collect()}
    assert set(rows) == {0, 1}
    assert rows[0] == [500000] * 8 and rows[1] == [500000] * 8


def test_pq_separated_clusters_roundtrip(spark):
    # v0/v2 at zero, v1/v3 at one: init (v0, v1) is already the fix
    # point; codes and exact ADC distances are hand-computable
    emb = _emb(spark, [[0.0] * 16, [1.0] * 16, [0.0] * 16, [1.0] * 16])
    sub = pq.quantized_subvectors(emb, m_sub=2, sub_dim=8).persist()
    sub.count()
    cb = pq.pq_train(sub, k=2, rounds=1)
    codes = {
        (r.vec_id, r.m): r.cid for r in pq.pq_encode(sub, cb).collect()
    }
    assert codes == {
        (0, 0): 0, (0, 1): 0, (2, 0): 0, (2, 1): 0,
        (1, 0): 1, (1, 1): 1, (3, 0): 1, (3, 1): 1,
    }
    top = pq.adc_topk(
        pq.pq_encode(sub, cb), cb, sub.filter(F.col("vec_id") == 0), 4
    ).collect()
    sub.unpersist()
    got = [(r.vec_id, r.adc) for r in top]
    far = 2 * 8 * 10**12  # two subspaces x 8 dims x (1e6)^2
    assert got == [(0, 0), (2, 0), (1, far), (3, far)]


def test_pq_empty_cell_keeps_centroid_and_mean_rounds(spark):
    # v0 == v1 == zeros: both init centroids are zeros, ties break to
    # cid 0, cell 1 captures nothing and must KEEP its old centroid;
    # cell 0's mean over (0, 0, 1e6) floor-rounds to 333333
    emb = _emb(spark, [[0.0] * 16, [0.0] * 16, [1.0] * 16])
    sub = pq.quantized_subvectors(emb, m_sub=2, sub_dim=8).persist()
    sub.count()
    cb = {(r.m, r.cid): r.qv for r in pq.pq_train(sub, k=2, rounds=1).collect()}
    sub.unpersist()
    assert cb[(0, 0)] == [333333] * 8 and cb[(1, 0)] == [333333] * 8
    assert cb[(0, 1)] == [0] * 8 and cb[(1, 1)] == [0] * 8


def test_pq_partitioning_invariance(spark):
    vecs = [[(i * 7 + j * 3) % 11 / 10.0 for j in range(16)] for i in range(20)]
    emb = _emb(spark, vecs)

    def run(e):
        sub = pq.quantized_subvectors(e, m_sub=2, sub_dim=8).persist()
        sub.count()
        cb = pq.pq_train(sub, k=3, rounds=2)
        out = pq.adc_topk(
            pq.pq_encode(sub, cb), cb, sub.filter(F.col("vec_id") == 0), 5
        ).collect()
        sub.unpersist()
        return [(r.vec_id, r.adc) for r in out]

    assert run(emb) == run(emb.repartition(7))

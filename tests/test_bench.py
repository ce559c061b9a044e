"""bench.py contract tests — the r02 postmortem class.

r02 lost ALL timings because one query's AnalysisException killed the
whole bench run. The harness now isolates failures per query and
always prints one JSON line; these tests pin that contract without
paying a full sf0.1 suite run.

r06 postmortem additions: the judge's pytest run CLOBBERED the round's
official BENCH_LAST.json (bench wrote the sidecar unconditionally), and
the driver's 2000-char stdout tail sheared the ~4 kB full record's head
off two rounds running ("parsed": null). bench now routes the sidecar
through $SPARK_GRAFT_BENCH_OUT and prints a compact (<1.5 kB)
self-contained summary as the VERY LAST stdout line; tests pin both.
"""

from __future__ import annotations

import json
import os

import pytest


def _run_bench(monkeypatch, capsys, tmp_path, queries):
    import bench

    out_path = tmp_path / "bench_out.json"
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(out_path))
    monkeypatch.setattr(bench, "BENCH_QUERIES", list(queries))
    # pin the tail tier off: these tests time a fixed tiny suite, not
    # the full registry sweep the auto-derived tail would trigger
    monkeypatch.setattr(bench, "bench_tail_queries", lambda: [])
    bench.main()
    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if ln
    ]
    # last line = compact summary; the full record is the line before it
    # (and, authoritatively, the sidecar file)
    summary = json.loads(lines[-1])
    full = json.loads(lines[-2])
    sidecar = json.loads(out_path.read_text())
    assert sidecar == full
    return full, summary


def test_bench_isolates_broken_queries(monkeypatch, capsys, tmp_path, spark):
    """One broken query must cost only its own timing: the good
    queries still report, the error is recorded, and the output is
    one parseable JSON line."""
    from nhs_data_pipeline_spark import queries as Q

    def boom(spark, sf_dir):
        raise RuntimeError("synthetic failure for bench isolation test")

    monkeypatch.setitem(Q.QUERIES, "__broken__", boom)
    got, summary = _run_bench(
        monkeypatch, capsys, tmp_path,
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
    # compact summary agrees with the full record
    assert summary["value"] == got["value"]
    assert summary["n_queries"] == 2 and summary["n_errors"] == 1
    assert set(summary["worst5"]) <= set(got["queries"])


def test_bench_reports_unknown_names(monkeypatch, capsys, tmp_path, spark):
    """A registry rename must not crash the bench — but it must not be
    SILENT either: unknown names are recorded as errors (the silent
    skip hid an accidental four-query deregistration until the
    per-query map was eyeballed)."""
    got, summary = _run_bench(
        monkeypatch, capsys, tmp_path,
        ["q6_forecast_revenue", "__nonexistent__"],
    )
    assert set(got["queries"]) == {"q6_forecast_revenue"}
    assert got["errors"] == {"__nonexistent__": "not in QUERIES registry"}
    assert summary["n_errors"] == 1


def test_bench_summary_line_fits_driver_tail(monkeypatch, capsys,
                                             tmp_path, spark):
    """The LAST stdout line must be a complete JSON object small enough
    to always survive the driver's 2000-char stdout tail window, even
    with the full ~100-query suite (each worst5 entry is <50 chars, so
    the bound holds regardless of suite size)."""
    got, summary = _run_bench(
        monkeypatch, capsys, tmp_path,
        ["q6_forecast_revenue", "j1_natural_left_join"],
    )
    line = json.dumps(summary)
    assert len(line) <= 1500
    assert summary["metric"] == "headline_suite_total_sec"
    assert len(summary["worst5"]) <= 5
    assert summary["full_record"] == "bench_out.json"


def test_bench_does_not_clobber_official_record(monkeypatch, capsys,
                                                tmp_path, spark):
    """With $SPARK_GRAFT_BENCH_OUT set, a bench run must leave the
    repo's official BENCH_LAST.json byte-identical (the r06 judge's
    pytest run destroyed the round's closing record)."""
    import bench

    official = os.path.join(
        os.path.dirname(os.path.abspath(bench.__file__)), "BENCH_LAST.json"
    )
    before = None
    if os.path.exists(official):
        with open(official, "rb") as fh:
            before = fh.read()
    _run_bench(monkeypatch, capsys, tmp_path, ["q6_forecast_revenue"])
    after = None
    if os.path.exists(official):
        with open(official, "rb") as fh:
            after = fh.read()
    assert before == after


def test_bench_suite_names_all_registered():
    """Every BENCH_QUERIES name must exist in the registry — a rename
    otherwise only surfaces as a runtime 'not in QUERIES registry'
    error in the round's official record."""
    import bench
    from nhs_data_pipeline_spark.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, missing
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_bench_tail_covers_registry(monkeypatch):
    """r8 judge ask #4: headline + tail + documented exclusions must
    tile the ENTIRE registry — every registered query is timed or has
    a written exclusion reason, and exclusions must name real
    registered queries with real reasons."""
    import bench
    from nhs_data_pipeline_spark.queries import QUERIES

    tail = bench.bench_tail_queries()
    covered = set(bench.BENCH_QUERIES) | set(tail) | set(
        bench.EXCLUDED_FROM_BENCH
    )
    assert covered == set(QUERIES), set(QUERIES) ^ covered
    # exclusions: registered, not double-listed, honestly documented
    for name, reason in bench.EXCLUDED_FROM_BENCH.items():
        assert name in QUERIES, name
        assert name not in bench.BENCH_QUERIES, name
        assert len(reason) > 40, name
    # BASELINE.md documents the same exclusion list (judge's done
    # criterion names that file)
    base = open(
        os.path.join(os.path.dirname(__file__), "..", "BASELINE.md")
    ).read()
    for name in bench.EXCLUDED_FROM_BENCH:
        assert name in base, f"{name} not documented in BASELINE.md"


def test_bench_tail_tier_records_timings(monkeypatch, capsys, tmp_path,
                                         spark):
    """The tail tier times its queries at tail_reps=1, merges them into
    the per-query map (so bench_regress guards them), and keeps
    'value' = the HEADLINE total for round-over-round comparability."""
    import bench

    out_path = tmp_path / "bench_tail.json"
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(out_path))
    monkeypatch.setattr(bench, "BENCH_QUERIES", ["q6_forecast_revenue"])
    monkeypatch.setattr(
        bench, "bench_tail_queries", lambda: ["j1_natural_left_join"]
    )
    bench.main()
    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if ln
    ]
    full = json.loads(lines[-2])
    assert set(full["queries"]) == {
        "q6_forecast_revenue", "j1_natural_left_join"
    }
    assert full["n_headline"] == 1 and full["n_tail"] == 1
    assert full["value"] == pytest.approx(
        full["queries"]["q6_forecast_revenue"], abs=0.01
    )
    assert full["tail_total_sec"] == pytest.approx(
        full["queries"]["j1_natural_left_join"], abs=0.01
    )
    assert full["tail_reps"] == 1

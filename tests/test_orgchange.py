"""Org-change subsystem tests: closure, classification, adjustment."""

from __future__ import annotations

from pyspark.sql import functions as F

from nhs_data_pipeline_spark.orgchange import (
    adjust_org_changes,
    classify_changes,
    successor_closure,
)
from nhs_data_pipeline_spark.orgchange.adjust import split_affected
import pytest


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["old_code", "new_code"])


def test_closure_multi_hop_chain(spark):
    out = successor_closure(_edges(spark, [("A", "B"), ("B", "C"), ("C", "D")]))
    got = {(r.old_code, r.final_code, r.n_hops) for r in out.collect()}
    assert got == {("A", "D", 3), ("B", "D", 2), ("C", "D", 1)}


def test_closure_split_fans_out(spark):
    out = successor_closure(_edges(spark, [("A", "B"), ("A", "C"), ("C", "D")]))
    got = {(r.old_code, r.final_code) for r in out.collect()}
    assert got == {("A", "B"), ("A", "D"), ("C", "D")}


def test_closure_merge_then_split(spark):
    out = successor_closure(_edges(spark, [("A", "M"), ("B", "M"), ("M", "X"), ("M", "Y")]))
    got = {(r.old_code, r.final_code) for r in out.collect()}
    assert got == {("A", "X"), ("A", "Y"), ("B", "X"), ("B", "Y"), ("M", "X"), ("M", "Y")}


@pytest.mark.slow
def test_closure_cycle_terminates(spark):
    out = successor_closure(_edges(spark, [("A", "B"), ("B", "A")]), max_iter=5)
    assert out.count() > 0  # bounded, no hang


@pytest.mark.slow
def test_classify_changes(spark):
    e = _edges(spark, [("A", "M"), ("B", "M"), ("S", "X"), ("S", "Y"), ("N1", "N2")])
    got = {(r.old_code, r.new_code): r.change_type for r in classify_changes(e).collect()}
    assert got[("A", "M")] == "merger"
    assert got[("B", "M")] == "merger"
    assert got[("S", "X")] == "split"
    assert got[("S", "Y")] == "split"
    assert got[("N1", "N2")] == "name_change"


def _panel(spark):
    rows = [
        # org, period, name, val
        ("OLD1", 2001, "Old One", 10.0),
        ("OLD1", 2002, "Old One", 20.0),
        ("OLD2", 2001, "Old Two", 5.0),
        ("NEW", 2001, "New Trust", 100.0),
        ("NEW", 2002, "New Trust", 200.0),
        ("PROB", 2001, "Problem Trust", 7.0),
        ("FREE", 2001, "Untouched", 1.0),
        ("NA1", 2001, "All Null", None),
    ]
    return spark.createDataFrame(rows, ["org_code", "period", "org_name", "val"])


def _lookup(spark):
    return spark.createDataFrame(
        [("OLD1", "NEW", 0, 0), ("OLD2", "NEW", 0, 0), ("PROB", "X", 0, 1)],
        ["old_code", "final_code", "experiences_split", "problematic"],
    )


@pytest.mark.slow
def test_adjust_merges_and_conserves_sums(spark):
    out = adjust_org_changes(
        _panel(spark), _lookup(spark), keys=["org_code", "period"],
        sum_cols=["val"], org_col="org_code", period_col="period",
    )
    rows = {(r.org_code, r.period): r for r in out.collect()}
    # merged trust: OLD1+OLD2+NEW in 2001 = 10+5+100
    assert rows[("NEW", 2001)].val == 115.0
    assert rows[("NEW", 2002)].val == 220.0
    # conservation: total value is preserved by adjustment
    total_before = 10 + 20 + 5 + 100 + 200 + 7 + 1
    total_after = sum(r.val for r in rows.values() if r.val is not None)
    assert total_after == total_before
    # problematic trust: flagged, not adjusted
    assert rows[("PROB", 2001)].exp_problematic_org_change == 1
    assert rows[("PROB", 2001)].val == 7.0
    # untouched trust: no flags
    assert rows[("FREE", 2001)].exp_unproblematic_org_change == 0
    # all-null measure stays NULL (NA-preserving sum)
    assert rows[("NA1", 2001)].val is None
    # adjusted group flags
    assert rows[("NEW", 2001)].unproblematic_org_change == 1
    assert rows[("NEW", 2002)].exp_unproblematic_org_change == 1
    # names re-attached from the snapshot
    assert rows[("NEW", 2001)].org_name == "New Trust"


@pytest.mark.slow
def test_adjust_idempotent(spark):
    """Adjusting an already-adjusted panel changes nothing (all old
    codes are gone after the first pass)."""
    out1 = adjust_org_changes(
        _panel(spark), _lookup(spark), keys=["org_code", "period"],
        sum_cols=["val"], org_col="org_code", period_col="period",
    ).select("org_code", "period", "val", "org_name")
    out2 = adjust_org_changes(
        out1, _lookup(spark), keys=["org_code", "period"],
        sum_cols=["val"], org_col="org_code", period_col="period",
    ).select("org_code", "period", "val", "org_name")
    a = {(r.org_code, r.period): r.val for r in out1.collect()}
    b = {(r.org_code, r.period): r.val for r in out2.collect()}
    assert a == b


@pytest.mark.slow
def test_split_affected_partitions(spark):
    aff, unaff = split_affected(_panel(spark), _lookup(spark))
    aff_codes = {r.org_code for r in aff.collect()}
    unaff_codes = {r.org_code for r in unaff.collect()}
    assert aff_codes == {"OLD1", "OLD2", "NEW", "PROB"}  # PROB via old_code, NEW via final
    assert unaff_codes == {"FREE", "NA1"}

"""Golden replay: run the engine's supporting-facilities org-change
adjuster on the reference's own committed clean CSV and compare against
the reference's committed adjusted CSV (SURVEY §5 strategy 4).

Skipped when the read-only reference checkout isn't present.
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

REF = "/root/reference/data"
CLEAN = f"{REF}/supporting-facilities/supporting-facilities_clean.csv"
GOLDEN = f"{REF}/supporting-facilities/supporting-facilities_clean_org_change_adj.csv"
LOOKUP = f"{REF}/org-changes/trust_lookup_uncomplicated_changes.csv"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CLEAN) and os.path.exists(GOLDEN) and os.path.exists(LOOKUP)),
    reason="reference data checkout not available",
)


def _canon(row):
    out = []
    for v in row:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            out.append(None)
        elif isinstance(v, float):
            out.append(round(v, 6))
        else:
            out.append(v)
    return tuple(out)


def test_supporting_facilities_golden_replay(spark):
    from nhs_data_pipeline_spark.io.readers import read_messy_csv
    from nhs_data_pipeline_spark.pipelines.supporting_facilities import (
        adjust_supporting_facilities,
    )

    # the reference reads these with read.csv defaults: header row 0,
    # "NA" as missing; keep "Data not returned" as text (numeric
    # coercion nulls it later, matching as.numeric)
    clean = read_messy_csv(spark, CLEAN, header=0, na_tokens=["NA", ""])
    lookup = (
        spark.read.csv(LOOKUP, header=True, inferSchema=True)
    )
    out = adjust_supporting_facilities(clean, lookup)

    got = sorted(
        _canon(
            (
                r.year, r.quarter, r.org_code,
                r.nr_operating_theatres, r.nr_day_case_theatres,
                r.exp_problematic_org_change, r.org_name,
                r.unproblematic_org_change, r.exp_unproblematic_org_change,
            )
        )
        for r in out.collect()
    )

    g = pd.read_csv(GOLDEN)
    exp = sorted(
        _canon(t)
        for t in g[
            [
                "year", "quarter", "org_code", "nr_operating_theatres",
                "nr_day_case_theatres", "exp_problematic_org_change",
                "org_name", "unproblematic_org_change",
                "exp_unproblematic_org_change",
            ]
        ].itertuples(index=False, name=None)
    )

    assert len(got) == len(exp), f"rows: engine={len(got)} golden={len(exp)}"
    mismatches = [(a, b) for a, b in zip(got, exp) if a != b]
    assert not mismatches, f"first mismatches: {mismatches[:5]}"

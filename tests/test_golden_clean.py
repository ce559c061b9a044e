"""Golden replay #3: rebuild the reference's supporting-facilities
*clean* panel from its committed raw append via the engine's
column-consolidation (J2) + junk-row filters, matching the committed
``supporting-facilities_clean.csv`` (scripts/build_datasets_main.py:
305-386) exactly.

Semantics note: the committed clean CSV contains zero 'NA' sentinel
strings, i.e. it was produced with sentinel-as-missing semantics (the
committed script's literal string comparisons disagree with its own
committed output by 27 'England total' pseudo-org rows). The engine's
convention — sentinels become SQL NULL at the ingest edge — reproduces
the committed output bit-for-bit.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

REF = "/root/reference/data/supporting-facilities"
RAW = f"{REF}/supporting-facilities.csv"
GOLDEN = f"{REF}/supporting-facilities_clean.csv"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(RAW) and os.path.exists(GOLDEN)),
    reason="reference data checkout not available",
)

OUT_COLS = [
    "year_var", "quarter_var", "SHA", "organisation_code",
    "organisation_name", "area_team_code", "area_team_name",
    "region_code", "region_name", "nr_operating_theatres",
    "nr_day_case_theatres",
]


def test_supporting_facilities_clean_replay(spark):
    from nhs_data_pipeline_spark.functions import clean_sentinels
    from nhs_data_pipeline_spark.ops.core import coalesce_columns, rename_columns

    raw = spark.read.option("header", True).option("nullValue", "").csv(RAW)
    # sentinel 'NA' strings -> NULL (engine ingest convention; matches
    # the committed clean output)
    for c in raw.columns:
        raw = raw.withColumn(c, clean_sentinels(F.col(c), ["", "NA"]))

    # :325-335 — era-variant column consolidation (J2)
    df = coalesce_columns(
        raw,
        {
            "SHA_2": ["SHA", "SHA Code"],
            "organisation_code": ["OrgID", "Organisation Code"],
            "organisation_name": ["Name", "Organisation Name"],
            "area_team_code": ["Area Team Code"],
            "area_team_name": ["Area Team Name"],
            "region_code": ["Region Code"],
            "region_name": ["Region Name"],
        },
    )
    # :337-345 — drop leftovers (incl. the literal 'NA' column), rename
    df = df.drop("NA")
    df = rename_columns(
        df,
        {
            "SHA_2": "SHA",
            "Number of operating theatres": "nr_operating_theatres",
            "Of which, number of dedicated day case theatres": "nr_day_case_theatres",
        },
    )
    # :353-360 — junk-row filters (P6/P7) under null-sentinel semantics
    df = (
        df.filter(F.col("organisation_code").isNotNull())
        .filter(
            F.col("nr_day_case_theatres").isNotNull()
            & (
                F.col("nr_day_case_theatres")
                != "Of which, number of dedicated day case theatres"
            )
        )
        .filter(
            ~F.col("organisation_name").isin(
                "England (Including Independent Sector)",
                "England (Excluding Independent Sector)",
            )
        )
    )
    got = sorted(
        tuple("" if r[c] is None else r[c] for c in OUT_COLS)
        for r in df.select(*OUT_COLS).collect()
    )

    g = pd.read_csv(GOLDEN, dtype=str, keep_default_na=False)
    exp = sorted(tuple(t) for t in g[OUT_COLS].itertuples(index=False, name=None))
    assert len(got) == len(exp), f"rows: engine={len(got)} golden={len(exp)}"
    mismatches = [(a, b) for a, b in zip(got, exp) if a != b]
    assert not mismatches, f"first mismatches: {mismatches[:5]}"

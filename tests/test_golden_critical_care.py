"""Reference-data validation of the critical-care beds panel.

The reference commits the CLEANED monthly panel
(critical_care_beds_2002_20_clean.csv) but not its raw sheets, so
these tests run the engine's critical-care helpers
(pipelines/critical_care.py) over the committed golden rows:

- schema: all positional era-B measure names landed
  (build_datasets_critical_care_beds.R:201-205);
- fiscal-year mapping round-trips on every real row: Jan-Mar months
  belong to the fiscal END year (build_datasets_critical_care_beds.R:
  220-228), and the committed date column agrees with (month, year);
- occupancy ratio direction occupied/open with NULL on zero beds —
  including the DOCUMENTED divergence: the reference's
  loop-with-early-return bug (:239-247) recomputed ONLY the first bed
  type (adult), so the golden's paediatric/neonatal percent columns
  keep raw zeros where open == 0; the engine recomputes all three
  types (SURVEY §5, deliberately not replicated).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

GOLDEN = "/root/reference/data/critical-care-beds/critical_care_beds_2002_20_clean.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference data checkout not available"
)


def _read(spark):
    return (
        spark.read.option("header", True)
        .option("nullValue", "NA")
        .option("inferSchema", True)
        .csv(GOLDEN)
    )


def test_positional_measure_names_present(spark):
    from nhs_data_pipeline_spark.pipelines.critical_care import (
        POSITIONAL_MEASURES,
    )

    cols = set(_read(spark).columns)
    # the clean panel renames pct columns to *_beds_percent_occupied /
    # *_cots_or_beds_percent_occupied; the open/occupied/transfer
    # measures keep their positional era-B names verbatim
    for name in POSITIONAL_MEASURES:
        if name.endswith("percent_occupied"):
            continue
        assert name in cols, name
    assert {
        "adult_critical_care_beds_percent_occupied",
        "paediatric_intensive_care_beds_percent_occupied",
        "neonatal_critical_care_cots_or_beds_percent_occupied",
        "org_code", "org_name", "date", "month", "year",
    } <= cols


def test_fiscal_year_mapping_roundtrip_on_every_row(spark):
    """Reconstruct each row's fiscal label from its calendar (year,
    month) and assert calendar_year_from_fiscal maps it back — the
    Jan-Mar -> end-year roll exercised on all 19,602 real rows."""
    from nhs_data_pipeline_spark.pipelines.critical_care import (
        calendar_year_from_fiscal,
    )

    df = _read(spark)
    is_q4 = F.lower(F.col("month")).isin("january", "february", "march")
    fiscal_start = F.when(is_q4, F.col("year") - 1).otherwise(F.col("year"))
    labeled = df.withColumn("calendar_truth", F.col("year")).withColumn(
        "year",
        F.concat(
            fiscal_start.cast("string"),
            F.lit("-"),
            F.lpad(((fiscal_start + 1) % 100).cast("string"), 2, "0"),
        ),
    )
    got = calendar_year_from_fiscal(labeled, "month", "year")
    assert got.filter(
        F.col("calendar_year") != F.col("calendar_truth")
    ).count() == 0
    assert df.count() == 19602


def test_date_column_agrees_with_month_and_year(spark):
    from nhs_data_pipeline_spark.pipelines.critical_care import MONTHS

    df = _read(spark)
    month_num = F.element_at(
        F.create_map(
            *[x for i, m in enumerate(MONTHS) for x in (F.lit(m), F.lit(i + 1))]
        ),
        F.lower(F.col("month")),
    )
    bad = df.filter(
        (F.month("date") != month_num)
        | (F.year("date") != F.col("year"))
        | (F.dayofmonth("date") != 1)
    ).count()
    assert bad == 0


def test_occupancy_direction_and_early_return_divergence(spark):
    from nhs_data_pipeline_spark.pipelines.critical_care import (
        recompute_occupancy_all_types,
    )

    df = _read(spark)
    got = recompute_occupancy_all_types(df)

    # adult (the one bed type the reference's early-return loop reached):
    # engine recompute == golden exactly, including NULL on zero beds
    assert got.filter(
        ~F.col("adult_critical_care_percent_occupied").eqNullSafe(
            F.col("adult_critical_care_beds_percent_occupied")
        )
        & ~(
            F.abs(
                F.col("adult_critical_care_percent_occupied")
                - F.col("adult_critical_care_beds_percent_occupied")
            )
            <= 1e-9
        )
    ).count() == 0

    for stem, golden_pct in [
        (
            "number_of_paediatric_intensive_care_beds",
            "paediatric_intensive_care_beds_percent_occupied",
        ),
        (
            "number_of_neonatal_critical_care_cots_or_beds",
            "neonatal_critical_care_cots_or_beds_percent_occupied",
        ),
    ]:
        prefix = (
            "paediatric_intensive_care"
            if "paediatric" in stem
            else "neonatal_critical_care"
        )
        ours = F.col(f"{prefix}_percent_occupied")
        theirs = F.col(golden_pct)
        open_c = F.col(f"{stem}_open")
        # where beds are open, the golden ratio IS occupied/open
        assert got.filter(
            (open_c > 0) & (F.abs(ours - theirs) > 1e-9)
        ).count() == 0
        # documented divergence footprint: the golden keeps raw zeros
        # where open == 0 (the early-return bug skipped the recompute);
        # the engine yields NULL there
        zero_rows = got.filter(open_c == 0)
        assert zero_rows.filter(theirs.isNotNull()).count() > 0
        assert zero_rows.filter(ours.isNotNull()).count() == 0

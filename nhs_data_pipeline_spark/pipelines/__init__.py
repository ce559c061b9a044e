"""Declarative series pipelines (the reference's interactive scripts as
config)."""

from nhs_data_pipeline_spark.pipelines.runner import SeriesConfig, run_series  # noqa: F401

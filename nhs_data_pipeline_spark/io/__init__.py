"""Ingest and sink layer."""

from nhs_data_pipeline_spark.io.readers import (  # noqa: F401
    detect_header_row,
    read_messy_csv,
    read_messy_excel,
    with_filename_metadata,
)
from nhs_data_pipeline_spark.io.writers import write_single_csv  # noqa: F401

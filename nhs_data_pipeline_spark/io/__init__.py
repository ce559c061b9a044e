"""Ingest and sink layer."""

from nhs_data_pipeline_spark.io.download import (  # noqa: F401
    download_file,
    download_manifest,
    extract_links,
    latest_file,
    list_raw_files,
    sanitize_filename,
)
from nhs_data_pipeline_spark.io.readers import (  # noqa: F401
    detect_header_row,
    file_matches_skip_predicate,
    read_messy_csv,
    read_messy_excel,
    read_messy_excel_multi,
    with_filename_metadata,
)
from nhs_data_pipeline_spark.io.writers import write_single_csv  # noqa: F401

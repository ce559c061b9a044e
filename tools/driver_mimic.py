"""Replay of the driver's pandas-side result canonicalization.

The driver does NOT compare Spark collect() rows the way
tools/check_oracle.py does — it pulls both results into pandas, sorts
columns by name, sorts rows by every column (``sort_values``), then
hashes TYPED values. That pipeline is stricter than the local gate in
ways that have already bitten once (r05: ``embed_kmeans_fit`` returned
an array column; the local gate compared fine, the driver's
``sort_values`` crashed on the unorderable cells and recorded a red
row). This module replays that canonicalization so the known AND
unknown driver-hostile shapes (unorderable object cells, mixed-type
object columns, exotic scalar types the typed hash can't tag) fail in
pytest before they fail in CORRECTNESS_r{N}.json.

Used by tests/test_driver_mimic.py over every registry query's
sf0.001 output, on BOTH the Spark->toPandas and DuckDB->df() paths.
"""

from __future__ import annotations

import datetime
import hashlib
import math
from decimal import Decimal

import numpy as np
import pandas as pd


class DriverHostileType(TypeError):
    """A cell value the driver's typed hash has no stable tag for."""


def _tag(v) -> bytes:
    """Type-tagged byte encoding of one scalar cell. Mirrors the typed
    comparison discipline of tools/check_oracle.canon: int 0, float
    0.0, and Decimal('0') are all DIFFERENT."""
    if v is None or v is pd.NaT:
        return b"<null>"
    if isinstance(v, (bool, np.bool_)):
        return b"b:1" if v else b"b:0"
    if isinstance(v, (int, np.integer)):
        return b"i:%d" % int(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return b"<null>"
        return ("f:%r" % f).encode()
    if isinstance(v, Decimal):
        return ("dec:%s" % v).encode()
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return ("t:%s" % v.isoformat()).encode()
    if isinstance(v, datetime.date):
        # Spark DATE lands in pandas as datetime.date objects while
        # DuckDB DATE lands as midnight datetime64 — the driver hashes
        # these EQUAL (f_string_date_family / f8 are driver-attested
        # green with DATE outputs), so tag a date as its midnight
        # timestamp rather than a distinct type class
        return (
            "t:%s" % datetime.datetime(v.year, v.month, v.day).isoformat()
        ).encode()
    if isinstance(v, (bytes, bytearray)):
        return b"y:" + bytes(v)
    # arrays / maps / structs / anything else: the driver's pandas
    # sort + factorize chokes on these (the r05 kmeans crash class)
    raise DriverHostileType(
        f"driver-hostile cell type {type(v).__name__}: {v!r}"
    )


def canonicalize(pdf: pd.DataFrame) -> str:
    """Sort columns by name, sort rows by all columns, typed-hash every
    cell. Raises (does not coerce) on anything the driver's pipeline
    would choke on:

    - ``sort_values`` raises TypeError on unorderable object columns
      (list/dict cells, str-vs-int mixes) exactly like the driver did
      on r05's array output;
    - mixed non-null Python types within one column raise — a column
      that interleaves int and float cells hashes differently from any
      single-typed oracle column, so it is a latent driver mismatch
      even when values compare equal untyped;
    - unknown scalar types raise DriverHostileType.
    """
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(
            by=list(pdf.columns), kind="mergesort", na_position="last"
        ).reset_index(drop=True)
    h = hashlib.sha256()
    for c in pdf.columns:
        cells = pdf[c].tolist()
        kinds = set()
        for v in cells:
            t = _tag(v)
            h.update(t)
            h.update(b"\x00")
            if t != b"<null>":
                kinds.add(t.split(b":", 1)[0])
        if len(kinds) > 1:
            raise DriverHostileType(
                f"column {c!r} mixes cell type classes "
                f"{sorted(k.decode() for k in kinds)} — a typed hash "
                f"can never match a single-typed oracle column"
            )
        h.update(b"\x01")
    return h.hexdigest()

"""Registry-wide replay of the driver's pandas canonicalization.

The r05 ``embed_kmeans_fit`` red row proved the driver's result
pipeline (toPandas -> sort_values over every column -> typed value
hash) is STRICTER than the local collect()-based gate: the gate
compared the array column fine while the driver's pandas sort crashed
on unorderable cells. tests/test_plans.py pins the known failure mode
(no array/map/struct outputs); this test replays the full
canonicalization (tools/driver_mimic.py) over every registry query's
sf0.001 output on BOTH engine paths to pre-catch the unknown ones:
mixed-type object columns, driver-hostile scalar types, unorderable
cells, and typed-hash divergence that only appears through the pandas
dtype conversions (collect() gives datetime.date where toPandas gives
object-of-date; DuckDB .df() gives midnight datetime64 — verified
equal under the driver since f_string_date_family is 5x
driver-attested green with a DATE column).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from nhs_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.driver_mimic import DriverHostileType, canonicalize

_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.mark.slow
def test_every_query_survives_driver_canonicalization(spark, sf_dir, duck):
    """Every registered query's Spark output AND its DuckDB oracle
    output must pass the driver-mimic canonicalizer without raising,
    and the two typed hashes must agree. One loop (not parametrize) so
    the whole registry shares the session fixture and a single failure
    report names every offender at once."""
    failures = []
    for name, fn in QUERIES.items():
        try:
            sp = canonicalize(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001 — collect every offender
            failures.append(f"{name} [spark]: {type(e).__name__}: {e}")
            continue
        if name not in ORACLES:
            continue
        try:
            dp = canonicalize(duck.execute(ORACLES[name]).df())
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name} [duck]: {type(e).__name__}: {e}")
            continue
        if sp != dp:
            failures.append(f"{name}: typed pandas-path hash mismatch")
    assert not failures, "\n".join(failures)


def test_canonicalizer_rejects_known_driver_hostile_shapes():
    """The mimic must actually catch the r05 crash class — otherwise
    the registry-wide sweep above is vacuously green."""
    import pandas as pd

    # array cells: pandas sort_values raises (the kmeans crash)
    with pytest.raises(Exception):
        canonicalize(pd.DataFrame({"a": [[1, 2], [3]]}))
    # mixed int/float object column: typed hash can never match a
    # single-typed oracle column
    with pytest.raises(DriverHostileType):
        canonicalize(pd.DataFrame({"a": pd.Series([1, 2.5], dtype=object)}))
    # driver-hostile scalar type
    with pytest.raises(DriverHostileType):
        canonicalize(pd.DataFrame({"a": [object()]}))


def test_canonicalizer_matches_date_vs_midnight_timestamp():
    """Spark DATE -> datetime.date vs DuckDB DATE -> midnight
    datetime64 must hash EQUAL (the driver attests DATE-output queries
    green), while differing dates must not."""
    import datetime

    import pandas as pd

    a = pd.DataFrame({"d": [datetime.date(2020, 1, 2)]})
    b = pd.DataFrame({"d": pd.to_datetime(["2020-01-02"])})
    c = pd.DataFrame({"d": pd.to_datetime(["2020-01-03"])})
    assert canonicalize(a) == canonicalize(b)
    assert canonicalize(a) != canonicalize(c)

"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs every declared query at a given sf dir through Spark AND its
oracle SQL through DuckDB, then compares row count + (sorted-column,
sorted-row) values. Floats are compared exactly first, with a small
tolerance fallback reported separately — the real driver hashes values,
so "close" is not good enough; this surfaces which queries are at risk.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from nhs_data_pipeline_spark.queries import ORACLES, QUERIES  # noqa: E402
from nhs_data_pipeline_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def canon(v):
    """Type-tagged canonical form. The driver hashes typed values, so
    int 0 vs float 0.0 vs Decimal('0') are all DIFFERENT — a local pass
    on untyped equality (0 == 0.0) can still hash-mismatch driver-side
    (happened: s10_histogram r02). Tag every scalar with a type class."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def rows_canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


def close(a, b):
    if a == b:
        return True
    if (isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b)
            and a[:1] == ("f",) and b[:1] == ("f",)
            and isinstance(a[1], float) and isinstance(b[1], float)):
        return math.isclose(a[1], b[1], rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(close(x, y) for x, y in zip(a, b))
    return False


def unchecked_after(name, only):
    """Gate-run names AFTER `name` in iteration order — the queries
    that go unchecked when the post-OOM DuckDB reconnect exhausts its
    retries. Reported as failures so the gate output reflects true
    coverage (r9 ADVICE: a silent break under-reported the gap)."""
    order = [n for n in QUERIES if not only or n in only]
    return order[order.index(name) + 1 :]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # a typo'd / renamed query name must FAIL LOUDLY — with a silent
    # set-intersection the gate prints "all green" vacuously having
    # checked nothing (the build-notes silent-skip trap)
    unknown = only - set(QUERIES)
    if unknown:
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        sys.exit(2)
    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(ORACLES[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            if "Out of Memory" in str(e):
                # a hard OOM poisons the shared connection's allocator
                # state and CASCADES tiny-allocation failures into the
                # NEXT queries (observed in the r9 sf1 rehearsal:
                # embed_kmeans_fit's unrolled-CTE oracle OOM'd, then
                # 25-node graph queries failed 2 KB allocations) —
                # reconnect so one heavy oracle can't fail its
                # neighbors. The freed buffers can lag the close()
                # (the rehearsal's reconnect itself failed a 2 KB
                # view-create), so retry with a pause.
                import gc
                import time as _t

                try:
                    con.close()
                except Exception:  # noqa: BLE001 — already wedged
                    pass
                con = None
                gc.collect()
                for _ in range(5):
                    try:
                        con = duck_con(sf_dir)
                        break
                    except Exception:  # noqa: BLE001 — still draining
                        _t.sleep(5)
                        gc.collect()
                if con is None:
                    # the remaining queries go UNCHECKED — record each
                    # by name so the failure list reflects true
                    # coverage, not just the OOM'd query (r9 ADVICE:
                    # a silent break under-reported the gap)
                    skipped = unchecked_after(name, only)
                    failures.extend(skipped)
                    print(
                        "FAIL  <reconnect>: duckdb would not reopen; "
                        f"{len(skipped)} queries UNCHECKED: {skipped}"
                    )
                    break
            continue
        status = []
        if sorted(s_cols) != sorted(d_cols):
            status.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            status.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not status:
            sc, dc = rows_canon(s_cols, s_rows), rows_canon(d_cols, d_rows)
            exact = sc == dc
            if not exact:
                near = len(sc) == len(dc) and all(close(a, b) for a, b in zip(sc, dc))
                if near:
                    diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:2]
                    status.append(f"FLOAT-RISK (near but not exact): {diffs}")
                else:
                    diffs = [(a, b) for a, b in zip(sc, dc) if not close(a, b)][:3]
                    status.append(f"values differ, e.g. {diffs}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

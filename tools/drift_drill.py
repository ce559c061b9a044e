"""Schema-drift drill (r02's failure class, rehearsed every round).

The driver REGENERATES /root/testdata between rounds and physical
types have changed before (r02: events.ts TIMESTAMP(NANOS) -> MICROS
killed every events query). This drill rewrites a copy of the gate
data with the two drift directions seen or anticipated so far —
``events.ts`` back to TIMESTAMP(NANOS) and ``o_orderdate`` /
``l_shipdate`` TIMESTAMP -> DATE — then runs the FULL oracle gate
against the drifted copy. Readers must branch on the landed dtype;
a green run proves both directions are absorbed with zero code change.

Usage: python tools/drift_drill.py [src_sf_dir] (default sf0.01).
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


def _rewrite(src: Path, dst: Path, casts: dict[str, pa.DataType]) -> None:
    t = pq.read_table(src)
    arrays, fields = [], []
    for field in t.schema:
        col = t.column(field.name)
        if field.name in casts:
            col = col.cast(casts[field.name])
            field = pa.field(field.name, casts[field.name])
        arrays.append(col)
        fields.append(field)
    out = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    # store nanos as-is (no coercion): this is the INT64 nanos physical
    # type the r01-era driver data used
    pq.write_table(out, dst, coerce_timestamps=None)


def main() -> int:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
    tmp = Path(tempfile.mkdtemp(prefix="drift_sf_"))
    try:
        for f in src.glob("*.parquet"):
            if f.stem == "events":
                _rewrite(f, tmp / f.name, {"ts": pa.timestamp("ns")})
            elif f.stem == "orders":
                _rewrite(f, tmp / f.name, {"o_orderdate": pa.date32()})
            elif f.stem == "lineitem":
                _rewrite(f, tmp / f.name, {"l_shipdate": pa.date32()})
            else:
                shutil.copy(f, tmp / f.name)
        print(f"drifted copy at {tmp}: events.ts->ns, order/ship dates->DATE")
        rc = subprocess.call(
            [
                sys.executable,
                str(Path(__file__).resolve().parent / "check_oracle.py"),
                str(tmp),
            ]
        )
        return rc
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())

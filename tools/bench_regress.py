"""Per-query bench regression check against the recorded minima.

The driver's grade is "BENCH within 2x of BASELINE"; BASELINE.md's
adjudication says the honest per-query record is the MINIMUM across
all recorded runs (co-tenant steal inflates individual samples up to
the documented 122-186 s spread). This tool folds every BENCH_r*.json
per-query map plus BENCH_LAST.json into those minima and flags any
current reading above ``--factor`` (default 2.0) of its recorded best
— so a regression is caught locally BEFORE the round closes, not in
the next round's verdict.

Usage: python tools/bench_regress.py [current.json] [--factor 2.0]
  current.json defaults to BENCH_LAST.json.
Exit 1 if any query regresses; queries with no prior record are listed
as "new" and never fail the check.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_queries(path: str) -> dict[str, float]:
    try:
        with open(path) as fh:
            text = fh.read()
    except OSError:
        return {}
    # BENCH_r*.json driver records carry a "tail" string holding (part
    # of) the JSON line; BENCH_LAST.json is the line itself
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        return {}
    if isinstance(d, dict) and "queries" in d:
        return {k: float(v) for k, v in d["queries"].items()}
    if isinstance(d, dict) and "tail" in d:
        # best-effort: parse the per-query map out of the sheared tail
        tail = d["tail"]
        out: dict[str, float] = {}
        import re

        for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail):
            name, val = m.group(1), m.group(2)
            if name in ("value", "sf", "reps"):
                continue
            try:
                out[name] = float(val)
            except ValueError:
                pass
        return out
    return {}


def main() -> int:
    # parse --factor first so its space-separated value token is not
    # mistaken for the positional current-record path (r8 ADVICE fix)
    factor = 2.0
    factor_value_idx: set[int] = set()
    for i, a in enumerate(sys.argv[1:], start=1):
        if a.startswith("--factor"):
            if "=" in a:
                factor = float(a.split("=", 1)[1])
            else:
                factor = float(sys.argv[i + 1])
                factor_value_idx.add(i + 1)
    args = [
        a
        for i, a in enumerate(sys.argv[1:], start=1)
        if not a.startswith("--") and i not in factor_value_idx
    ]
    cur_path = args[0] if args else os.path.join(REPO, "BENCH_LAST.json")
    cur = _load_queries(cur_path)
    if not cur:
        print(f"no parseable current record at {cur_path}")
        return 2
    best: dict[str, float] = {}
    # BENCH_r*.json = driver records (sheared tails: only the last ~60
    # per-query entries survive); BENCH_CLOSE_r*.json = the committed
    # full closing record of each session (complete per-query map) —
    # the convention that gives head-of-suite queries a history at all.
    # Records BEFORE round 5 are excluded: r05 switched the bench
    # action from count() (which let Catalyst prune aggregate-join
    # work — the count()-lies trap) to hash-sum-all-columns, so
    # r01-r04 per-query times measure less work and are incomparable
    # (q1 read 0.33 s under count() vs ~1.1 s honestly evaluated).
    def _comparable(path: str) -> bool:
        import re as _re

        m = _re.search(r"BENCH(?:_CLOSE)?_r(\d+)\.json$", path)
        return bool(m) and int(m.group(1)) >= 5

    history = sorted(
        p
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        + glob.glob(os.path.join(REPO, "BENCH_CLOSE_r*.json"))
        if _comparable(p)
    )
    for p in history:
        for k, v in _load_queries(p).items():
            if k not in best or v < best[k]:
                best[k] = v
    regressed, new = [], []
    for k, v in sorted(cur.items()):
        if k not in best:
            new.append(k)
            continue
        if v > factor * best[k]:
            regressed.append((k, v, best[k]))
    for k, v, b in regressed:
        print(f"REGRESSED {k}: {v:.2f}s vs best {b:.2f}s ({v / b:.1f}x)")
    if new:
        print(f"new (no prior record): {', '.join(new)}")
    n_ok = len(cur) - len(regressed) - len(new)
    print(f"{n_ok} within {factor}x of best, {len(regressed)} regressed, "
          f"{len(new)} new")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())

"""Generate an sf-N-equivalent synthetic dataset for gate rehearsals.

The driver's testdata tops out at sf0.1; the r8 verdict (ask #5) wants
the FULL oracle gate run once at sf1 to catch magnitude-coupled float
issues the sf0.1 pass can't (the r03 quantizer class). This generator
reproduces the driver tables' schemas and value DOMAINS (measured from
/root/testdata/sf0.1 — vocab, type/step sets, ranges, key
relationships, including the documented traps: (l_orderkey,
l_linenumber) non-uniqueness, 1995-2001 order dates, NATION_<n> names,
near-duplicate documents) at any scale, seed-deterministic. It is NOT
the driver's generator — the gate checks Spark==DuckDB on whatever
data is present, so domain fidelity (not distribution identity) is
what the rehearsal needs.

Usage: python tools/make_sf.py <out_dir> [sf]   (default sf=1.0)
Writes the ten parquet tables with micros timestamps (the r03 landed
physical type).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["BUILDING", "MACHINERY", "HOUSEHOLD", "FURNITURE", "AUTOMOBILE"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
PTYPES = ["LARGE", "STANDARD", "ECONOMY", "SMALL", "MEDIUM", "PROMO"]
PADJ = ["large", "hot", "blue", "small", "dark", "cold", "light", "red"]
PNOUN = ["ring", "bolt", "disk", "cable", "panel", "lens", "gear", "valve"]
DOC_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]

DAY_US = 86_400_000_000


def _ts_us(base: str, us: np.ndarray) -> pa.Array:
    origin = np.datetime64(base, "us")
    return pa.array(origin + us.astype("timedelta64[us]"),
                    type=pa.timestamp("us"))


def main() -> None:
    out = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(42)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(150_000 * sf)
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.randint(0, 5, n_cust)],
    }))

    n_supp = int(10_000 * sf)
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    n_part = int(200_000 * sf)
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(rng.randint(0, 8, n_part),
                            rng.randint(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.randint(0, 25, n_part)],
        "p_type": [PTYPES[i] for i in rng.randint(0, 6, n_part)],
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
    }))

    n_ord = int(1_500_000 * sf)
    # order dates: 1995-01-01 .. 2001-08-01 (the non-classic span)
    span_days = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")
                 ).astype(int)
    odate_day = rng.randint(0, span_days + 1, n_ord).astype(np.int64)
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [("O", "P", "F")[i]
                          for i in rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01", odate_day * DAY_US),
        "o_orderpriority": [PRIORITIES[i] for i in rng.randint(0, 5, n_ord)],
    }))

    n_li = int(6_000_000 * sf)
    li_order = rng.randint(0, n_ord, n_li).astype(np.int64)
    # 1..7 linenumbers, NOT unique per (orderkey, linenumber) — the
    # documented synthetic-data trap every window must survive
    li_lineno = rng.randint(1, 8, n_li).astype(np.int32)
    ship_off = rng.randint(-2400, 2500, n_li).astype(np.int64)
    ship_day = np.clip(odate_day[li_order] + ship_off, 1,
                       span_days + 95)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(li_order, pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(li_lineno, pa.int32()),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.randint(0, 11, n_li) / 100.0,
        "l_tax": rng.randint(0, 9, n_li) / 100.0,
        "l_returnflag": [("A", "N", "R")[i]
                         for i in rng.randint(0, 3, n_li)],
        "l_linestatus": [("O", "F")[i] for i in rng.randint(0, 2, n_li)],
        "l_shipdate": _ts_us("1995-01-01", ship_day * DAY_US),
    }))

    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    ev_us = rng.randint(0, 30 * DAY_US, n_ev, dtype=np.int64)
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_us("2024-01-01", ev_us),
        "user_id": pa.array(rng.randint(0, n_users, n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.randint(0, 5, n_ev)],
        "value": np.round(
            np.minimum(rng.exponential(50.0, n_ev), 560.25), 2),
        "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, n_ev)],
    }))

    n_doc = int(50_000 * sf)
    vocab = np.array(DOC_VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        n_words = int(rng.randint(8, 92))
        texts.append(" ".join(vocab[rng.randint(0, len(vocab), n_words)]))
    # near/exact duplicates (~1.5%): dedup queries must see real pairs
    n_dup = max(1, n_doc // 64)
    dup_src = rng.randint(0, n_doc, n_dup)
    for j, s in enumerate(dup_src):
        tgt = int(rng.randint(0, n_doc))
        if j % 2 == 0:
            texts[tgt] = texts[s]  # exact duplicate
        else:  # near-duplicate: one word appended
            texts[tgt] = texts[s] + " " + str(vocab[rng.randint(len(vocab))])
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i]
                 for i in rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.randint(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_vec = int(20_000 * sf)
    dim = 64
    centers = rng.randn(10, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, 10, n_vec)
    vecs = centers[labels] + 0.35 * rng.randn(n_vec, dim)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    main()

"""True suffix-array ExactSubstr ground truth vs span_dedup_stats
(r10 verdict ask #4).

``llm/spans.py`` computes the Lee et al. 2021 "ExactSubstr" signal
(tokens inside a verbatim-repeated run of >= k tokens) with a
distributed k-gram md5-fingerprint join instead of the paper's suffix
array. At the TOKEN level the two definitions coincide mathematically:
a token sits inside a repeated run of length >= k iff it is covered by
some duplicated k-window (any token at offset j of an m>=k repeated
run has a window start in [max(0, j-k+1), min(m-k, j)], nonempty).
What the identity does NOT protect against is implementation error:
md5 collisions, tokenizer drift between engines, or an interval-union
bug would each silently shift coverage.

This tool therefore builds the ground truth through a COMPLETELY
INDEPENDENT algorithm, driver-side (numpy): prefix-doubling suffix
array + Kasai LCP over the sentinel-separated token-id corpus, exactly
the paper's construction ("Deduplicating Training Data Makes Language
Models Better", Lee et al. 2021, §4.1: a position starts a duplicated
window iff its maximal repeated-prefix length — max of the LCPs with
its suffix-order neighbors — is >= k). Per-doc duplicated-window
counts and covered-token interval unions are then compared
integer-exactly against the operator's output on the same corpus at
the gate's window length (k=8), and window/coverage-weighted
recall/precision are reported.

Corpus: the sampled-sf1 documents (.scratch/sf1s — the r10
sampled-gate construction, sf1 doc lengths/vocab at bounded volume).
Falls back to /root/testdata/sf0.1 with --sf01.

With ``--trim`` the tool additionally verifies ``span_dedup_trim``
(r11's keep-one-copy ACTION) against the same suffix array: all
occurrences of one k-window are CONTIGUOUS in suffix-array order
(runs linked by LCP >= k), so each duplicate group falls out of one
SA walk; the canonical = min (doc_id, pos) member, every other member
is redundant, and the expected rewritten text is rebuilt token-wise
in numpy/python and compared string-exactly per document.

Usage: python tools/exactsubstr_ground_truth.py [--sf01] [--k K] [--trim]
"""

from __future__ import annotations

import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def java_ws_tokens(text: str | None) -> list[str]:
    """Replicates tokenized_frame exactly: Spark regexp_replace of
    Java \\s ([ \\t\\n\\x0b\\f\\r]) runs to one space, trim (spaces),
    split on single space. NULL -> no tokens; ''.split -> [''] which
    counts as 0 tokens (the operator's blank-doc convention)."""
    if text is None:
        return []
    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text).strip(" ")
    toks = norm.split(" ")
    return [] if toks == [""] else toks


def build_suffix_array(s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Prefix-doubling suffix array over an int array. Returns
    (sa, rank) with rank[i] = position of suffix i in sa order."""
    n = len(s)
    _, rank = np.unique(s, return_inverse=True)
    rank = rank.astype(np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        if k < n:
            second[: n - k] = rank[k:]
        sa = np.lexsort((second, rank))
        new = np.empty(n, dtype=np.int64)
        key1, key2 = rank[sa], second[sa]
        neq = (key1[1:] != key1[:-1]) | (key2[1:] != key2[:-1])
        new[sa[0]] = 0
        new[sa[1:]] = np.cumsum(neq)
        rank = new
        if rank[sa[-1]] == n - 1:
            return sa, rank
        k *= 2


def kasai_lcp(s: np.ndarray, sa: np.ndarray, rank: np.ndarray) -> np.ndarray:
    """lcp[r] = LCP(suffix sa[r], suffix sa[r+1]); lcp[n-1] = 0."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r < n - 1:
            j = sa[r + 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def main() -> None:
    k = 8
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    if "--sf01" in sys.argv:
        data_dir = "/root/testdata/sf0.1"
    else:
        data_dir = os.path.join(REPO, ".scratch", "sf1s")
        if not os.path.isdir(data_dir):
            sys.exit(f"missing {data_dir} — run tools/sf1_sampled_gate.py")

    import duckdb

    t0 = time.time()
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{data_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    print(f"corpus: {len(rows)} docs from {data_dir}")

    # ---- ground truth: suffix array over sentinel-separated token ids
    vocab: dict[str, int] = {}
    seq: list[int] = []
    doc_bounds: list[tuple[int, int, int]] = []  # (doc_id, start, n_tok)
    next_sentinel = -1  # unique per doc: can never participate in a repeat
    for doc_id, text in rows:
        toks = java_ws_tokens(text)
        start = len(seq)
        for t in toks:
            tid = vocab.setdefault(t, len(vocab))
            seq.append(tid)
        doc_bounds.append((doc_id, start, len(toks)))
        seq.append(next_sentinel)
        next_sentinel -= 1
    s = np.asarray(seq, dtype=np.int64)
    n = len(s)
    print(f"tokens+sentinels: {n}, vocab: {len(vocab)} "
          f"[{time.time() - t0:.1f}s]")

    sa, rank = build_suffix_array(s)
    print(f"suffix array built [{time.time() - t0:.1f}s]")
    lcp = kasai_lcp(s, sa, rank)
    print(f"LCP built [{time.time() - t0:.1f}s]")

    # maximal repeated-prefix length per position = max(LCP with the
    # two suffix-order neighbors); >= k <=> position starts a
    # duplicated k-window (Lee et al. §4.1 semantics)
    maxrep = np.zeros(n, dtype=np.int64)
    r = rank
    left_ok = r > 0
    maxrep[left_ok] = lcp[r[left_ok] - 1]
    right_ok = r < n - 1
    np.maximum(maxrep, np.where(right_ok, lcp[np.minimum(r, n - 2)], 0),
               out=maxrep)
    dup_start = maxrep >= k

    truth: dict[int, tuple[int, int]] = {}  # doc_id -> (dup_spans, covered)
    for doc_id, start, n_tok in doc_bounds:
        if n_tok < k:
            truth[doc_id] = (0, 0)
            continue
        starts = np.flatnonzero(dup_start[start : start + n_tok - k + 1])
        if len(starts) == 0:
            truth[doc_id] = (0, 0)
            continue
        gaps = np.diff(starts)
        covered = int(np.minimum(gaps, k).sum()) + k
        truth[doc_id] = (int(len(starts)), covered)
    n_dup_docs = sum(1 for v in truth.values() if v[0] > 0)
    print(f"ground truth: {n_dup_docs} docs with duplicated spans "
          f"[{time.time() - t0:.1f}s]")

    # ---- operator side: span_dedup_stats on the same corpus
    from nhs_data_pipeline_spark.llm import spans as sp
    from nhs_data_pipeline_spark.session import get_spark

    spark = get_spark("exactsubstr-gt")
    docs = spark.read.parquet(os.path.join(data_dir, "documents.parquet"))
    op_rows = sp.span_dedup_stats(docs, "text", "doc_id", k=k).collect()
    op = {row["doc_id"]: (row["dup_spans"], row["covered_tokens"])
          for row in op_rows}
    print(f"operator run: {len(op)} docs [{time.time() - t0:.1f}s]")

    # ---- compare
    assert set(op) == set(truth), "doc_id set mismatch"
    mismatch = [
        (d, truth[d], op[d]) for d in truth if truth[d] != op[d]
    ]
    t_spans = sum(v[0] for v in truth.values())
    o_spans = sum(v[0] for v in op.values())
    i_spans = sum(min(truth[d][0], op[d][0]) for d in truth)
    t_cov = sum(v[1] for v in truth.values())
    o_cov = sum(v[1] for v in op.values())
    i_cov = sum(min(truth[d][1], op[d][1]) for d in truth)
    print(f"\nk={k}  docs={len(truth)}  docs_mismatching={len(mismatch)}")
    print(f"windows: truth={t_spans} operator={o_spans}  "
          f"recall={i_spans / t_spans:.6f} precision={i_spans / o_spans:.6f}"
          if t_spans and o_spans else
          f"windows: truth={t_spans} operator={o_spans}")
    print(f"coverage: truth={t_cov} operator={o_cov}  "
          f"recall={i_cov / t_cov:.6f} precision={i_cov / o_cov:.6f}"
          if t_cov and o_cov else
          f"coverage: truth={t_cov} operator={o_cov}")
    for d, tv, ov in mismatch[:10]:
        print(f"  mismatch doc {d}: truth={tv} op={ov}")
    if mismatch:
        sys.exit(1)
    print("EXACT MATCH: operator == suffix-array ground truth")

    if "--trim" not in sys.argv:
        return

    # ---- keep-one-copy trim ground truth (r11 operator)
    # Duplicate k-window groups = maximal runs in SA order linked by
    # LCP >= k. Walk once; groups of size >= 2 are the duplicated
    # fingerprints, canonical = min (doc_id, offset).
    pos_to_doc = np.full(n, -1, dtype=np.int64)
    pos_to_off = np.full(n, -1, dtype=np.int64)
    for di, (doc_id, start, n_tok) in enumerate(doc_bounds):
        pos_to_doc[start : start + n_tok] = di
        pos_to_off[start : start + n_tok] = np.arange(n_tok)
    redundant: dict[int, list[int]] = {}  # doc index -> window offsets
    i = 0
    while i < n - 1:
        if lcp[i] >= k:
            j = i
            while j < n - 1 and lcp[j] >= k:
                j += 1
            members = sa[i : j + 1]
            keyed = sorted(
                (int(pos_to_doc[p]), int(pos_to_off[p])) for p in members
            )
            for d_i, off in keyed[1:]:  # all but the canonical
                redundant.setdefault(d_i, []).append(off)
            i = j + 1
        else:
            i += 1
    expected: dict[int, tuple[int, str]] = {}
    for di, (doc_id, start, n_tok) in enumerate(doc_bounds):
        toks = java_ws_tokens(rows[di][1])
        assert len(toks) == n_tok
        drop = np.zeros(n_tok, dtype=bool)
        for off in redundant.get(di, ()):
            drop[off : off + k] = True
        kept = [t for t, dr in zip(toks, drop) if not dr]
        expected[doc_id] = (int(drop.sum()), " ".join(kept))
    print(f"trim ground truth: {len(redundant)} docs with redundant "
          f"windows [{time.time() - t0:.1f}s]")

    trim_rows = sp.span_dedup_trim(docs, "text", "doc_id", k=k).collect()
    trim_op = {
        r["doc_id"]: (r["n_removed"], r["cleaned"]) for r in trim_rows
    }
    assert set(trim_op) == set(expected), "trim doc_id set mismatch"
    t_mis = [
        (d, expected[d], trim_op[d])
        for d in expected
        if expected[d] != trim_op[d]
    ]
    removed_total = sum(v[0] for v in expected.values())
    print(f"trim: docs={len(expected)} removed_tokens={removed_total} "
          f"docs_mismatching={len(t_mis)}")
    for d, ev, ov in t_mis[:5]:
        print(f"  trim mismatch doc {d}: truth={ev[:80]} op={ov[:80]}")
    if t_mis:
        sys.exit(1)
    print("EXACT MATCH: span_dedup_trim == suffix-array keep-one-copy")


if __name__ == "__main__":
    main()

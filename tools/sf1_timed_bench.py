"""Timed sf0.1 -> sf1 scaling bench (r10 verdict ask #2).

The sf1 gates (r9 full rehearsal, r10 sampled-quadratic rehearsal)
prove CORRECTNESS at 10x magnitude but never put numbers on the
scaling curve — a query could go super-linear and every gate would
still be green. This tool times the heaviest headline queries at
sf0.1 and at sf1 (the `.scratch/sf1` domain-faithful dataset from
tools/make_sf.py) and reports the wall-time ratio per query.

Interpretation: at a 10x row-count step, a linear-shape query should
land near 10x (minus fixed per-query overhead: driver loops, plan
analysis, model-table iterations — so well UNDER 10x is normal for
iteration-dominated ops). A ratio meaningfully ABOVE ~12x on a
documented-linear shape is a scale flag to investigate.

The quadratic-by-design families (countjoin Jaccard, embedding
brute-force pairs — the r9 cost-model exclusions) are timed on their
DECLARED sampled-sf1 dataset (`.scratch/sf1s`, 10% docs/embeddings at
sf1 magnitudes — the r10 sampled-gate construction): the claim for
that family is "bounded by the sample/budget design", not a scaling
exponent, so the ratio column is labelled accordingly.

Usage: python tools/sf1_timed_bench.py [--out PATH]
Needs .scratch/sf1 and .scratch/sf1s (build: tools/make_sf.py
.scratch/sf1 1.0 && tools/sf1_sampled_gate.py --rebuild).
Prints a table + writes JSON (default .scratch/sf1_timed_bench.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scratch", "sf1")
SF1S = os.path.join(REPO, ".scratch", "sf1s")

# ~30 heaviest LINEAR-shape headline queries by the r10 close-record
# minima (BENCH_CLOSE_r10*.json), excluding the quadratic families.
LINEAR = [
    "embed_pca_scores",
    "embed_pca_power",
    "curate_audit_panel",
    "graph_hits_nations",
    "mixture_loo_perplexity",
    "classifier_logreg_fit",
    "text_repetition",
    "contamination_ngram",
    "graph_label_propagation",
    "curate_ccnet_buckets",
    "simhash_near_pairs",
    "graph_pagerank_nations",
    "graph_kcore_nations",
    "graph_shortest_paths",
    "text_lm_kneser_ney",
    "eval_isotonic_calibration",
    "dedup_incremental_near",
    "simhash_fingerprints",
    "graph_triangle_count",
    "tokenizer_fertility_by_source",
    "eval_kmeans_silhouette",
    "sketch_hll_set_algebra",
    "basket_pair_lift",
    "sample_dsir_ess",
    "sketch_count_min_terms",
    "tokenizer_bpe_encode",
    "dedup_span_pairs",
    "stats_kruskal_wallis",
    "events_robust_outliers",
    "text_bm25_topk",
    "embed_kmeans_fit",
]

# Quadratic-by-design: timed on the declared sampled-sf1 dataset
# (sf1s) — bounded-by-construction, not a scaling-exponent claim.
# dedup_semantic_cells moved here in r11: its cost is sum(|cell|^2),
# linear only when the quantizer's k scales with the corpus; the
# registered query pins k=8 for the cross-engine oracle literals, so
# at FULL sf1 every cell grows 10x and the op is honestly quadratic
# (measured 72x; k=64 restores 3x-of-linear — SCALE.md r11). The
# operator now carries a max_cell_pairs refuse-above-budget guard.
QUADRATIC_SAMPLED = [
    "dedup_jaccard_auto",
    "dedup_jaccard_exact_join",
    "dedup_jaccard_prefix_join",
    "dedup_weighted_prefix_join",
    "dedup_weighted_jaccard_join",
    "dedup_containment_join",
    "dedup_component_profile",
    "eval_lsh_sampled_quality",
    "dedup_semantic_cells",
]


def main() -> None:
    out_path = os.path.join(REPO, ".scratch", "sf1_timed_bench.json")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    for d in (SF1, SF1S):
        if not os.path.isdir(d):
            sys.exit(f"missing {d} — build with tools/make_sf.py / "
                     "tools/sf1_sampled_gate.py --rebuild")

    from nhs_data_pipeline_spark.queries import QUERIES
    from nhs_data_pipeline_spark.session import get_spark

    sys.path.insert(0, REPO)
    import bench

    spark = get_spark("sf1-timed-bench")
    # same steady-state discipline as bench.py: warm the session and
    # prime the codegen cache with one sf0.001 pass of every query.
    spark.read.parquet(os.path.join(SF01, "lineitem.parquet")).count()
    prime = "/root/testdata/sf0.001"
    for name in LINEAR + QUADRATIC_SAMPLED:
        try:
            bench._force(QUERIES[name](spark, prime))
        except Exception as e:  # noqa: BLE001
            print(f"prime FAIL {name}: {e}", flush=True)

    results: dict[str, dict] = {}

    def timed(name: str, sf_dir: str) -> float:
        t0 = time.time()
        bench._force(QUERIES[name](spark, sf_dir))
        return round(time.time() - t0, 3)

    for tier, names, big_dir in (
        ("linear", LINEAR, SF1),
        ("quadratic_sampled", QUADRATIC_SAMPLED, SF1S),
    ):
        for name in names:
            # Per-query cache isolation (r11): operators that persist
            # per-call (audit_panel's input cache, model tables) leak
            # those caches into later queries' readings in a shared
            # session — the first run of this tool read
            # curate_audit_panel at 160 s where a fresh session
            # measures 60 s. Real clusters run queries in their own
            # jobs; clearing between queries is the honest analogue.
            spark.catalog.clearCache()
            try:
                # min-of-2 at sf0.1 (steady-state), single rep at sf1
                # (the big reading is the one we can afford once)
                t_small = min(timed(name, SF01), timed(name, SF01))
                t_big = timed(name, big_dir)
                results[name] = {
                    "tier": tier,
                    "sf0.1_sec": t_small,
                    "big_sec": t_big,
                    "ratio": round(t_big / t_small, 2) if t_small else None,
                }
                print(f"{name:34s} {tier:17s} sf0.1={t_small:7.2f}s "
                      f"big={t_big:8.2f}s ratio={results[name]['ratio']}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                results[name] = {"tier": tier, "error": str(e)[:300]}
                print(f"{name:34s} ERROR {str(e)[:150]}", flush=True)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    json.dump(results, open(out_path, "w"), indent=1)
    print(f"\nwrote {out_path}")
    errs = [n for n, r in results.items() if "error" in r]
    hot = [
        (n, r["ratio"]) for n, r in results.items()
        if r.get("tier") == "linear" and (r.get("ratio") or 0) > 12.0
    ]
    print(f"errors: {errs or 'none'}")
    print(f"linear-tier ratios >12x: {hot or 'none'}")


if __name__ == "__main__":
    main()

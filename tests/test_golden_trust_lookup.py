"""Golden replay #2: rebuild the reference's trust lookup from its
committed org-change paths via the engine's successor closure, and
match the committed ``trust_lookup_uncomplicated_changes.csv``.

The raw successor extract isn't in the snapshot, but the committed
paths file (``all_org_changes_paths_2000_2018.csv``) encodes every
one-hop edge (old->new_code_1, new_code_1->new_code_2, ...), so the
closure + problematic-flag + split-swap logic of
scripts/org-changes/build_trust_lookup.R:57-107 is fully replayable.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

REF = "/root/reference/data/org-changes"
PATHS = f"{REF}/all_org_changes_paths_2000_2018.csv"
GOLDEN = f"{REF}/trust_lookup_uncomplicated_changes.csv"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(PATHS) and os.path.exists(GOLDEN)),
    reason="reference data checkout not available",
)


def test_trust_lookup_golden_replay(spark):
    from nhs_data_pipeline_spark.ops.core import natural_join, union_by_name
    from nhs_data_pipeline_spark.orgchange import successor_closure

    paths = spark.read.csv(PATHS, header=True, inferSchema=True, nullValue="NA")

    # reconstruct the one-hop edge list from consecutive path hops
    hops = [("old_code", "new_code_1"), ("new_code_1", "new_code_2"), ("new_code_2", "new_code_3")]
    edges = union_by_name(
        [
            paths.filter(F.col(b).isNotNull()).select(
                F.col(a).alias("old_code"), F.col(b).alias("new_code")
            )
            for a, b in hops
        ]
    ).distinct()

    # build_trust_lookup.R:57-89 — any-code -> final-code closure,
    # self-maps removed
    mapping = (
        successor_closure(edges)
        .select("old_code", "final_code")
        .filter(F.col("old_code") != F.col("final_code"))
        .distinct()
    )

    # :92-100 — attach unproblematic path info, flag problematic
    unprob = (
        paths.filter(F.col("part_of_complicated_path") == 0)
        .select("experiences_split", "final_code")
        .distinct()
    )
    mapping = natural_join(mapping, unprob, how="left").withColumn(
        "problematic", F.when(F.col("experiences_split").isNull(), 1).otherwise(0)
    )

    # :104-107 — clean splits become 'backwards mergers' (code swap)
    swap = (F.col("experiences_split") == 1) & (F.col("problematic") == 0)
    mapping = mapping.select(
        F.when(swap, F.col("final_code")).otherwise(F.col("old_code")).alias("old_code"),
        F.when(swap, F.col("old_code")).otherwise(F.col("final_code")).alias("final_code"),
        "experiences_split",
        "problematic",
    )

    got = sorted(
        (r.old_code, r.final_code,
         None if r.experiences_split is None else int(r.experiences_split),
         int(r.problematic))
        for r in mapping.collect()
    )

    g = pd.read_csv(GOLDEN)
    exp = sorted(
        (r.old_code, r.final_code,
         None if pd.isna(r.experiences_split) else int(r.experiences_split),
         int(r.problematic))
        for r in g.itertuples(index=False)
    )

    assert len(got) == len(exp), f"rows: engine={len(got)} golden={len(exp)}"
    mismatches = [(a, b) for a, b in zip(got, exp) if a != b]
    assert not mismatches, f"first mismatches: {mismatches[:5]}"

"""Relational core operators (SURVEY §2 surface).

Every op is a pure ``DataFrame -> DataFrame`` (or Column) function built
from native Catalyst expressions; chains fuse into one optimized plan.
"""

from nhs_data_pipeline_spark.ops.core import (  # noqa: F401
    clean_names,
    coalesce_columns,
    cumulative_sum,
    drop_positional,
    drop_all_null_columns,
    fill_directional,
    filter_rows_from_marker,
    first_per_group,
    grouped_any_flag,
    grouped_max_over,
    grouped_sum_na_preserving,
    last_per_group,
    natural_join,
    rename_columns,
    reorder_columns,
    select_by_pattern,
    slice_rows,
    union_by_name,
    unpivot,
)
from nhs_data_pipeline_spark.ops.binned import (  # noqa: F401
    binned_median,
    pct_within_threshold,
)
from nhs_data_pipeline_spark.ops.temporal import (  # noqa: F401
    asof_join,
    range_join_binned,
)
from nhs_data_pipeline_spark.ops.sampling import (  # noqa: F401
    capped_per_stratum,
    deterministic_sample,
    deterministic_shuffle,
    hash_bucket,
    hash_split,
    stratified_sample,
    temperature_sample,
    token_budget_sample,
)
from nhs_data_pipeline_spark.ops.diff import (  # noqa: F401
    diff_summary,
    snapshot_diff,
)
from nhs_data_pipeline_spark.ops.fuzzy import (  # noqa: F401
    fuzzy_match_dist1,
)
from nhs_data_pipeline_spark.ops.skew import (  # noqa: F401
    salted_grouped_sum,
    salted_join,
)
from nhs_data_pipeline_spark.ops.analytics import (  # noqa: F401
    funnel,
    peak_concurrency,
    retention_cohorts,
)
from nhs_data_pipeline_spark.ops.quality import (  # noqa: F401
    content_fingerprint,
)

"""RTT wait-times specifics: bin-schema harmonization (R6).

Era-variant RTT releases either stop at ``between_52_plus`` or carry
finer >=52-week bins plus a ``total_52_plus_weeks`` column
(build_datasets_wait_times.R:347-363). Harmonize to the common schema:
when the explicit 52+ total exists, drop the >=52 sub-bins and the
extra totals, and rename the total to ``between_52_plus``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from nhs_data_pipeline_spark.ops.core import rename_columns


def harmonize_wait_bins(df: DataFrame, cutoff: int = 52) -> DataFrame:
    """Converge era-variant weekly wait-bin schemas on ``between_0_1``
    ... ``between_<cutoff>_plus``."""
    if f"total_{cutoff}_plus_weeks" not in df.columns:
        return df
    drop = []
    for c in df.columns:
        m = re.fullmatch(r"between_(\d+)_(\d+)", c)
        if m and int(m.group(1)) >= cutoff:
            drop.append(c)
        elif c in (f"between_{cutoff}_plus",):
            drop.append(c)
        elif re.fullmatch(r"total_(\d+)_plus_weeks", c) and c != f"total_{cutoff}_plus_weeks":
            # era-C carries extra coarse totals (62+/104+) alongside the
            # 52+ one; the documented contract drops them so stray
            # era-specific columns never union into the panel
            drop.append(c)
    out = df.drop(*drop)
    return rename_columns(out, {f"total_{cutoff}_plus_weeks": f"between_{cutoff}_plus"})

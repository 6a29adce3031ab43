"""Change-data-capture style snapshot comparison.

The reference pins dated source snapshots (`scripts/import/
temp-import-all-api-ftp.R:16,19` — release 22.1, 2025_02_28 folder) but
has no way to ask "what changed between releases". ``snapshot_diff``
answers that: keyed full-outer comparison classifying every key as
insert / delete / update, with unchanged rows dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of a keyed table.

    Returns the key columns plus ``change`` ∈ {'insert','delete',
    'update'}; unchanged keys are filtered out. ``compare_cols``
    defaults to all shared non-key columns; comparison is null-safe
    (NULL vs NULL = unchanged, NULL vs value = update).

    Plan: one full-outer shuffle join on the key; the change
    classification and the unchanged-row filter are map-side. At scale
    this is the standard reconciliation shape — both sides partitioned
    by the key, skew handled by AQE; bucketed snapshots make it
    shuffle-free.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in keys + compare_cols]
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in keys + compare_cols]
    )
    cond = None
    for k in keys:
        c = F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"__o_{keys[0]}").isNotNull()
    in_new = F.col(f"__n_{keys[0]}").isNotNull()
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__o_{k}"), F.col(f"__n_{k}")).alias(k)
                for k in keys
            ],
            "change",
        )
    )

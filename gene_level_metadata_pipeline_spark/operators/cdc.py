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


def join_view_delta(
    a_new: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: str | list[str],
    sign_col: str = "sign",
) -> DataFrame:
    """Signed row-delta of a two-table join view — incremental view
    maintenance's core identity, the join sibling of
    ``harmonize.retract_aggregate`` (which maintains aggregates but
    must be handed the changed FACTS; this derives the changed facts of
    a JOIN from the base-table deltas without re-joining the bases):

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_new ⋈ ΔB

    the standard asymmetric expansion of (A_old + ΔA) ⋈ (B_old + ΔB)
    — the ΔA ⋈ ΔB cross term is absorbed by using A_NEW (not A_old) in
    the second term; getting either state wrong double-counts or drops
    exactly the delta-delta pairs, which is what the oracle's full
    recompute certifies against.

    ``delta_a`` / ``delta_b`` carry ``sign_col`` (+1 insert / -1
    delete) and otherwise the same columns as their base tables; the
    output carries both payloads and the pair's sign (a deleted A row
    joining surviving B rows emits -1 rows, etc. — signs multiply, and
    a base-side row always has implicit sign +1, so each term's sign
    is just its delta side's).

    Scale shape: two key-partitioned equi-joins whose LEFT inputs are
    delta-sized — the view is maintained by shuffling the deltas and
    re-reading only the join-relevant base partitions (bucketed bases
    make both joins co-located); the O(|A|·|B|-scan) full re-join never
    runs. Downstream, one signed aggregate + a merge with the stored
    view (agg_retract_merge's discipline) completes the maintenance.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # the delta_b rename below guards one collision; guard the
    # symmetric ones too — a base table legitimately carrying a column
    # named sign_col would make t1's (or t2's) sign ambiguous and the
    # union would silently mislabel pair signs (ADVICE r7)
    for nm, frame in (("a_new", a_new), ("b_old", b_old)):
        if sign_col in frame.columns:
            raise ValueError(
                f"join_view_delta: {nm} carries a column named "
                f"{sign_col!r}; pass a different sign_col"
            )
    t1 = delta_a.join(b_old, keys)
    t2 = a_new.join(
        delta_b.withColumnRenamed(sign_col, f"__{sign_col}"), keys
    ).withColumnRenamed(f"__{sign_col}", sign_col)
    return t1.unionByName(t2.select(*t1.columns))

"""Driver-facing query registry: every implemented SURVEY.md §2 operator as a
named (spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string.

Conventions (driver contract, see __spark_entry__.py):
  * every computed column is aliased identically in the Spark plan and the
    oracle SQL — the driver sorts columns by name before value-hashing;
  * doubles that pass through aggregation are rounded to a fixed scale in
    BOTH engines so the resulting IEEE doubles are bit-identical;
  * timestamps are cast to DATE or truncated+cast to string before output.

Each query's docstring names the SURVEY §2 operator(s) it certifies.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.operators.harmonize import harmonize, spine

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _round_to(col, n: int):
    """Double rounding that is bit-identical to DuckDB's ``round(x, n)``.

    DuckDB rounds doubles as ``std::round(x * 10^n) / 10^n``; Spark's
    ``round`` instead applies HALF_UP to the *exact* BigDecimal of x. The
    two disagree whenever ``x * 10^n`` lands exactly on .5 through double
    rounding (e.g. 28694.684999999998 * 100 == 2869468.5 → DuckDB 28694.69,
    Spark 28694.68) — common with 2-decimal price data. Computing
    ``round(x * 10^n, 0) / 10^n`` in Spark reproduces DuckDB exactly:
    same IEEE multiply, same half-away-from-zero on the product, same
    divide. Oracle-facing queries must use this instead of ``F.round``.
    """
    p = F.lit(float(10 ** n))
    return F.round(col * p, 0) / p


# ---------------------------------------------------------------------------
# J1 / U1 — the flagship: spine + harmonize
# ---------------------------------------------------------------------------

@_register(
    "spine_harmonize",
    oracle="""
    WITH spn AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IS NOT NULL
    ),
    src AS (
      SELECT o_custkey AS c_custkey,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_spend
      FROM orders GROUP BY o_custkey
    )
    SELECT DISTINCT spn.c_custkey, src.n_orders, src.total_spend
    FROM spn LEFT JOIN src USING (c_custkey)
    """,
)
def q_spine_harmonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 spine + J1 harmonize (utils/hgnc_symbol_template_func.R:3-10;
    tidy spine-join sites e.g. T:19-21): customer spine ← per-customer
    order aggregate, broadcast left join, full-row distinct."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spn = spine(customer, "c_custkey")
    src = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _round_to(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )
    return harmonize(spn, src, "c_custkey")


# ---------------------------------------------------------------------------
# Phase 1 — core relational ops
# ---------------------------------------------------------------------------

@_register(
    "project_rename_cast",
    oracle="""
    SELECT l_orderkey AS orderkey,
           CAST(l_linenumber AS VARCHAR) AS lineno,
           l_quantity AS qty,
           round(l_extendedprice * (1 - l_discount), 2) AS net_price
    FROM lineitem
    WHERE l_quantity > 30
    """,
)
def q_project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 select / P4 rename / P10 derived col / P13 cast / X20 arithmetic /
    F1 literal filter (T:13-17, T:95, T:16)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") > 30)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").cast("string").alias("lineno"),
            F.col("l_quantity").alias("qty"),
            _round_to(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_price"),
        )
    )


@_register(
    "positional_select",
    oracle="SELECT p_partkey, p_type, p_retailprice FROM part",
)
def q_positional_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 ordinal projection — R df[, c(1,4,6)] (TM:35, T:251)."""
    from gene_level_metadata_pipeline_spark.operators.headers import select_positional

    return select_positional(_t(spark, sf_dir, "part"), 1, 4, 6)


@_register(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_size
    FROM part
    WHERE p_size IN (5, 10, 15, 20)
      AND regexp_matches(p_type, '^(ECONOMY|SMALL)')
      AND NOT regexp_matches(p_name, 'widget')
      AND p_brand IS NOT NULL
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3 literal+null+IN filters, F7 regex contains, F8 negated regex
    (T:28, T:100, T:334, TW:59)."""
    p = _t(spark, sf_dir, "part")
    return p.where(
        F.col("p_size").isin(5, 10, 15, 20)
        & F.col("p_type").rlike("^(ECONOMY|SMALL)")
        & ~F.col("p_name").rlike("widget")
        & F.col("p_brand").isNotNull()
    ).select("p_partkey", "p_name", "p_type", "p_size")


@_register(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/J6 semi-join replacing the reference's pull-then-%in% (T:98)."""
    from gene_level_metadata_pipeline_spark.operators.joins import semi_join

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return semi_join(
        c.select("c_custkey", "c_name"),
        o.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
    )


@_register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 anti-join — !x %in% dups (TM:47)."""
    from gene_level_metadata_pipeline_spark.operators.joins import anti_join

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return anti_join(
        c.select("c_custkey", "c_name"),
        o.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
    )


@_register(
    "natural_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN (SELECT n_nationkey AS c_nationkey, n_name, n_regionkey FROM nation) n USING (c_nationkey)
    JOIN (SELECT n_regionkey, r_name FROM (SELECT r_regionkey AS n_regionkey, r_name FROM region)) r USING (n_regionkey)
    """,
)
def q_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 dplyr natural join — keys inferred from shared names after rename
    (T:20, T:145). Two chained natural joins: customer→nation→region."""
    from gene_level_metadata_pipeline_spark.operators.joins import natural_join

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    r = _t(spark, sf_dir, "region").withColumnRenamed("r_regionkey", "n_regionkey")
    out = natural_join(natural_join(c, n, how="inner"), r, how="inner")
    return out.select("c_custkey", "c_name", "n_name", "r_name")


@_register(
    "full_outer_join",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_cust
      FROM customer GROUP BY c_nationkey
    ),
    supp AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_supp
      FROM supplier GROUP BY s_nationkey
    )
    SELECT nationkey, n_cust, n_supp FROM cust FULL OUTER JOIN supp USING (nationkey)
    """,
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 full outer join (I:157, TW:43-44)."""
    from gene_level_metadata_pipeline_spark.operators.joins import full_join

    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return full_join(cust, supp, "nationkey")


@_register(
    "separate_rows",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part WHERE p_size >= 10
    UNION ALL
    SELECT p_partkey, NULL AS word FROM part WHERE p_size < 10
    """,
)
def q_separate_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 tidyr separate_rows incl. the NULL-row-preserving outer semantics
    (T:26 splits pipe-packed symbols; NULL genes survive)."""
    from gene_level_metadata_pipeline_spark.operators.reshape import separate_rows

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_size") < 10, F.lit(None)).otherwise(F.col("p_name")).alias("word"),
    )
    return separate_rows(p, "word", " ")


@_register(
    "union_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM (
      SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus <> 'F'
    )
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 union-all of homogeneous frames + R6 distinct (T:442, U:8)."""
    from gene_level_metadata_pipeline_spark.operators.reshape import distinct_all, union_all

    o = _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority")
    a = o.where(F.col("o_orderstatus") == "F")
    b = o.where(F.col("o_orderstatus") != "F")
    return distinct_all(union_all(a, b))


# ---------------------------------------------------------------------------
# Phase 4 — aggregation & conflict resolution
# ---------------------------------------------------------------------------

@_register(
    "count_freq",
    oracle="SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority",
)
def q_count_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 frequency count (T:215, TM:46)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "keep_unique",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    QUALIFY count(*) OVER (PARTITION BY o_custkey) = 1
    """,
)
def q_keep_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 keep-only-unambiguous keys via one window pass (T:213-219)."""
    from gene_level_metadata_pipeline_spark.operators.conflicts import keep_unique

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return keep_unique(o, "o_custkey")


@_register(
    "null_conflicts",
    oracle="""
    WITH d AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer),
    w AS (
      SELECT c_nationkey,
             CASE WHEN count(*) OVER (PARTITION BY c_nationkey) > 1
                  THEN NULL ELSE c_mktsegment END AS c_mktsegment
      FROM d
    )
    SELECT DISTINCT c_nationkey, c_mktsegment FROM w
    """,
)
def q_null_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 null-out-ambiguous dedup (T:273-277)."""
    from gene_level_metadata_pipeline_spark.operators.conflicts import null_conflicts

    d = _t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
    return null_conflicts(d, "c_nationkey")


@_register(
    "prefer_flagged",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
    QUALIFY count(*) OVER (PARTITION BY o_custkey) = 1
            OR o_orderpriority = '1-URGENT'
    """,
)
def q_prefer_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 prefer-flagged-row dedup (TW:158-166)."""
    from gene_level_metadata_pipeline_spark.operators.conflicts import prefer_flagged

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    return prefer_flagged(o, "o_custkey", "o_orderpriority", "1-URGENT")


@_register(
    "string_agg_ordered",
    oracle="""
    SELECT n_regionkey, string_agg(DISTINCT n_name, '|' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 ordered string aggregation — arrange→group→paste(collapse='|');
    array_sort makes collect_set deterministic (T:258-260)."""
    return (
        _t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.concat_ws("|", F.array_sort(F.collect_set("n_name"))).alias("nations"))
    )


@_register(
    "matrix_rowsum_pct",
    oracle="""
    SELECT l_partkey AS gene,
           sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS n_hit,
           count(*) AS n_samples,
           round(100.0 * sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) / count(*), 3) AS pct_hit
    FROM lineitem GROUP BY l_partkey
    """,
)
def q_matrix_rowsum_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+A9 long-form matrix rowSums over a binarized threshold + derived
    percentage (TW:20-26) — the engine's melt-not-transpose stance (R4)."""
    li = _t(spark, sf_dir, "lineitem")
    hit = F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)
    return (
        li.groupBy(F.col("l_partkey").alias("gene"))
        .agg(
            F.sum(hit).alias("n_hit"),
            F.count(F.lit(1)).alias("n_samples"),
            _round_to(100.0 * F.sum(hit) / F.count(F.lit(1)), 3).alias("pct_hit"),
        )
    )


@_register(
    "matrix_rowmean",
    oracle="""
    SELECT l_partkey AS gene, round(avg(l_extendedprice), 3) AS mean_score
    FROM lineitem GROUP BY l_partkey
    """,
)
def q_matrix_rowmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 long-form rowMeans + round-3 (TW:28-31, TW:45-46)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("gene"))
        .agg(_round_to(F.avg("l_extendedprice"), 3).alias("mean_score"))
    )

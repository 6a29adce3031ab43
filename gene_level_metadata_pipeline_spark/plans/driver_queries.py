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


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with its ns timestamp normalized to micros.

    Self-sufficient: the driver calls queries with ITS OWN SparkSession,
    which won't carry our session defaults — so the two confs the events
    path needs are set here (both are dynamic SQL confs):
      * nanosAsLong — Spark 4 otherwise refuses TIMESTAMP(NANOS) parquet;
      * UTC session timezone — timestamp_micros produces TIMESTAMP_LTZ,
        and rendering it (date_format/date_trunc) must agree with DuckDB's
        timezone-free naive timestamps; only UTC makes them coincide.
    """
    from gene_level_metadata_pipeline_spark.sources.readers import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_event_ts(_t(spark, sf_dir, "events"))


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


def _dsum(col, n: int = 2):
    """Order-independent rounded SUM of doubles, identical across engines.

    A plain double SUM is order-dependent (last-ulp differences between
    Spark's partial aggregation and DuckDB's sequential sum), and rounding
    cannot mask an ulp that straddles a .5 boundary — caught live at
    sf0.001 (q5 revenue 289145.575 → .57 vs .58). Fix: cast each addend to
    DECIMAL(18,6) (deterministic nearest-6-digit rounding of identical
    doubles; a tie would need the double to be exactly …5e-7, impossible
    in binary), sum exactly in decimal (associative — order cannot
    matter), round, cast back to double. Oracle twin:
    ``CAST(round(sum(CAST(x AS DECIMAL(18,6))), n) AS DOUBLE)``.
    """
    return F.round(F.sum(col.cast("decimal(18,6)")), n).cast("double")


def _davg(col, n: int):
    """Order-independent rounded AVG via exact decimal sum / count (both
    sides then perform the identical double division). Oracle twin:
    ``round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*), n)``
    wrapped by the engine's double-rounding (see _round_to)."""
    total = F.sum(col.cast("decimal(18,6)")).cast("double")
    return _round_to(total / F.count(F.lit(1)), n)


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
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_spend
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
            _dsum(F.col("o_totalprice"), 2).alias("total_spend"),
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
           CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           count(*) AS n_samples,
           round(CAST(100.0 * sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 3) AS pct_hit
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
    SELECT l_partkey AS gene, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 3) AS mean_score
    FROM lineitem GROUP BY l_partkey
    """,
)
def q_matrix_rowmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 long-form rowMeans + round-3 (TW:28-31, TW:45-46)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("gene"))
        .agg(_davg(F.col("l_extendedprice"), 3).alias("mean_score"))
    )


# ---------------------------------------------------------------------------
# Phase 2 — scalar layer (X-series)
# ---------------------------------------------------------------------------

@_register(
    "scalar_regex",
    oracle="""
    SELECT p_partkey,
           nullif(regexp_extract(p_brand, '#(\\d+)', 1), '') AS brand_num,
           nullif(regexp_extract(p_name, '(\\d{6})', 1), '') AS missing6,
           upper(substring(lower(p_type), 1, 1)) || substring(lower(p_type), 2) AS type_sentence,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           coalesce(array_to_string(regexp_extract_all(p_name, 'r\\w+'), '; '), '') AS r_words,
           string_split(p_name, ' ')[1] AS first_word,
           trim('  ' || p_name || '  ') AS trimmed,
           regexp_replace('ID' || p_partkey || '.' || p_size, '\\.[0-9]+$', '') AS id_unversioned
    FROM part
    """,
)
def q_scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 prefix+version strip, X3 global replace, X7 extract with NULL
    no-match, X9 extract-all joined, X11 token split, X12 trim, X13
    sentence case (T:175, TW:60, T:387, T:356-363, TW:13, T:133-135)."""
    from gene_level_metadata_pipeline_spark.functions.scalars import (
        extract_all_joined,
        extract_first,
        sentence_case,
        strip_version_suffix,
    )

    p = _t(spark, sf_dir, "part")
    versioned = F.concat(
        F.lit("ID"), F.col("p_partkey").cast("string"),
        F.lit("."), F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        extract_first("p_brand", r"#(\d+)").alias("brand_num"),
        extract_first("p_name", r"(\d{6})").alias("missing6"),
        sentence_case("p_type").alias("type_sentence"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        extract_all_joined("p_name", r"r\w+").alias("r_words"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        strip_version_suffix(versioned).alias("id_unversioned"),
    )


@_register(
    "recode_flag",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderpriority
             WHEN '1-URGENT' THEN 'P1' WHEN '2-HIGH' THEN 'P2'
             WHEN '3-MEDIUM' THEN 'P3' WHEN '4-NOT SPECIFIED' THEN 'P4'
             ELSE 'P5' END AS priority_code,
           CASE WHEN o_orderstatus IN ('F', 'P') THEN 'y' ELSE 'n' END AS done_flag
    FROM orders
    """,
)
def q_recode_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17 case_when recode + X16 %in% flag (T:420-431, T:486-491, T:255)."""
    from gene_level_metadata_pipeline_spark.functions.scalars import flag_in, recode

    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        recode(
            "o_orderpriority",
            {"1-URGENT": "P1", "2-HIGH": "P2", "3-MEDIUM": "P3",
             "4-NOT SPECIFIED": "P4"},
            default="P5",
        ).alias("priority_code"),
        flag_in("o_orderstatus", ["F", "P"]).alias("done_flag"),
    )


@_register(
    "sentinel_roundtrip",
    oracle="""
    WITH raw AS (
      SELECT p_partkey,
             CASE WHEN p_size < 5 THEN '' ELSE p_brand END AS brand_sentinel
      FROM part
    )
    SELECT p_partkey,
           nullif(brand_sentinel, '') AS brand_null,
           coalesce(nullif(brand_sentinel, ''), '-') AS brand_dash
    FROM raw
    """,
)
def q_sentinel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12/X18/X19 sentinel trinity: '' → NULL → '-' (T:17, T:411, T:451)."""
    from gene_level_metadata_pipeline_spark.functions.scalars import fill_sentinel, nullify

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_size") < 5, F.lit("")).otherwise(F.col("p_brand")).alias("brand_sentinel"),
    )
    nulled = nullify(p, "", cols=["brand_sentinel"]).withColumnRenamed(
        "brand_sentinel", "brand_null"
    )
    filled = fill_sentinel(
        nulled.select("p_partkey", F.col("brand_null").alias("brand_dash")),
        "-", cols=["brand_dash"],
    )
    return nulled.join(filled, "p_partkey")


# ---------------------------------------------------------------------------
# Phase 3 — reshape layer
# ---------------------------------------------------------------------------

@_register(
    "pivot_wider_status",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot_wider_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 pivot_wider long→wide (T:292-295). Pivot values passed explicitly
    so Spark skips the extra distinct-scan to discover them (at 100 TB that
    scan is a full pass over the fact table)."""
    from gene_level_metadata_pipeline_spark.operators.reshape import pivot_wider

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", F.lit(1).alias("one")
    )
    wide = pivot_wider(
        o, ["o_orderpriority"], "o_orderstatus", "one",
        agg="count", values=["F", "O", "P"],
    )
    return wide.na.fill(0, ["F", "O", "P"])


@_register(
    "kv_pivot_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           o_orderpriority AS priority,
           CAST(o_custkey AS VARCHAR) AS custkey
    FROM orders
    """,
)
def q_kv_pivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3/R4 round trip: wide → melt to (record_id, name, value) KV long
    form → kv_pivot back to wide on the record id. Replaces the reference's
    positional col-bind alignment (T:454-484) with order-independent
    record-id discipline."""
    from gene_level_metadata_pipeline_spark.operators.reshape import kv_pivot, melt

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_custkey").cast("string").alias("custkey"),
    )
    long = melt(o, ["o_orderkey"], ["status", "priority", "custkey"],
                var_name="name", value_name="value")
    return kv_pivot(long, "o_orderkey", "name", "value",
                    names=["status", "priority", "custkey"])


@_register(
    "melt_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def q_melt_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 wide→long melt via stack() — the engine's transpose-avoidance
    bridge (TW:16-18 does t() in RAM; we never build wide rows)."""
    from gene_level_metadata_pipeline_spark.operators.reshape import melt

    li = _t(spark, sf_dir, "lineitem")
    return melt(li, ["l_orderkey", "l_linenumber"],
                ["l_quantity", "l_discount", "l_tax"],
                var_name="metric", value_name="value")


# ---------------------------------------------------------------------------
# events — tumbling-window aggregation (batch form; streaming twin in
# streaming/windows.py)
# ---------------------------------------------------------------------------

@_register(
    "events_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 3) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts over the events table (SURVEY §2.12
    extension slice). Event-time normalization via normalize_event_ts."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("value"), 3).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped headline queries (bench + oracle breadth)
# ---------------------------------------------------------------------------

@_register(
    "tpch_q1_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
           round(avg(l_quantity), 3) AS avg_qty,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the bench workhorse for scan + hash
    aggregate (partial agg map-side, 6 aggregates, 2 group keys)."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        _dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("sum_disc_price"),
        _round_to(F.avg("l_quantity"), 3).alias("avg_qty"),
        _davg(F.col("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_register(
    "tpch_q3_topk",
    oracle="""
    SELECT o.o_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-30'
      AND l.l_shipdate > TIMESTAMP '1998-06-30'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped top-k: dimension filter → 3-way join → agg → global
    top-10. The customer side is broadcast; ties broken on o_orderkey so
    both engines return the identical row set."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-30").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-30").cast("timestamp")
    )
    joined = (
        F.broadcast(c.select("c_custkey"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue")
    )
    return (
        agg.select(
            "o_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@_register(
    "tpch_q5_region",
    oracle="""
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join: local-supplier revenue per nation within
    a region. Dimensions (nation, region, supplier) broadcast; the
    fact-fact orders⋈lineitem shuffle is the only exchange that scales
    with data size."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    joined = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue")
    )


@_register(
    "tpch_q6_forecast",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped filter+agg: the predicate-pushdown showcase (all
    four predicates reach the parquet scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Phase 5 — ingestion readers, certified against literal VALUES oracles
# (the driver's parquet views can't exercise these file shapes; see
# plans/fixtures.py)
# ---------------------------------------------------------------------------

@_register(
    "read_delim_skip",
    oracle="""
    SELECT * FROM (VALUES
      ('g1', CAST(1.5 AS DOUBLE), 'y'),
      ('g2', CAST(2.0 AS DOUBLE), 'n'),
      ('g3', CAST(NULL AS DOUBLE), 'y')
    ) AS t(gene, score, flag)
    """,
)
def q_read_delim_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 skip-N banner lines before the header (I:167-181; Spark CSV has
    no skipRows — engine reads text, drops N file-order rows, re-parses)."""
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_delim

    return read_delim(spark, f"{fixture_dir()}/skip.tsv", sep="\t", skip=2)


@_register(
    "read_headerless_positional",
    oracle="SELECT * FROM (VALUES ('x', 'a'), ('y', 'b'), ('z', 'c')) AS t(V3, V1)",
)
def q_read_headerless_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 headerless scan with R's V1..Vn naming + P3 positional consumption
    — fread(header=FALSE) then select(V7, V5) (I:117-120, T:251-253)."""
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_delim

    df = read_delim(spark, f"{fixture_dir()}/headerless.csv", sep=",", header=False)
    return df.select("V3", "V1")


@_register(
    "read_zip_tsv",
    oracle="""
    SELECT * FROM (VALUES
      ('k1', CAST(10 AS INTEGER)), ('k2', CAST(20 AS INTEGER))
    ) AS t(id, val)
    """,
)
def q_read_zip_tsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 TSV-inside-zip — readr::read_tsv('*.zip') transparently unzips
    (IW:22-23); no Spark zip codec, engine extracts to staging first."""
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_delim

    return read_delim(spark, f"{fixture_dir()}/fixture.zip", sep="\t")


@_register(
    "fix_shifted_header",
    oracle="""
    SELECT * FROM (VALUES
      ('g1', CAST(1.5 AS DOUBLE)), ('g2', CAST(2.5 AS DOUBLE))
    ) AS t(gene, score)
    """,
)
def q_fix_shifted_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 header-shift repair — drop first header name, shift left, drop
    the orphaned last column (T:504-508)."""
    from gene_level_metadata_pipeline_spark.operators.headers import fix_shifted_header
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_delim

    df = read_delim(spark, f"{fixture_dir()}/shifted.tsv", sep="\t")
    return fix_shifted_header(df)


@_register(
    "promote_first_row_header",
    oracle="SELECT * FROM (VALUES ('g1', '1.5'), ('g2', '2.0')) AS t(gene, score)",
)
def q_promote_first_row_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+O4 promote first file-order row to header, then slice(-1)
    (TM:107-109) — needs the single-file __row_id discipline."""
    from gene_level_metadata_pipeline_spark.operators.headers import (
        promote_first_row_to_header,
    )
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_delim

    df = read_delim(
        spark, f"{fixture_dir()}/promote.csv", sep=",", header=False,
        infer_schema=False,
    )
    return promote_first_row_to_header(df)


@_register(
    "read_json_pages_kv",
    oracle="""
    SELECT * FROM (VALUES
      ('gene_symbol', 'g1'), ('panel.id', '1'), ('panel.name', 'p1'),
      ('gene_symbol', 'g2'), ('panel.id', '2'), ('panel.name', 'p2')
    ) AS t(name, value)
    """,
)
def q_read_json_pages_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 paginated JSON → flattened (name, value) long records with dotted
    paths — enframe(unlist(fromJSON(page))) (I:211-218), record id carried
    for the downstream R3 pivot."""
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_json_pages

    d = fixture_dir()
    kv = read_json_pages(
        spark, [f"{d}/pages/page1.json", f"{d}/pages/page2.json"],
        flatten_kv=True,
    )
    return kv.select("name", "value")


# ---------------------------------------------------------------------------
# sessionization — gap-based sessions over the events stream (batch form)
# ---------------------------------------------------------------------------

@_register(
    "sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sessions AS (
      SELECT user_id, event_id, us,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(us) AS start_us, max(us) AS end_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) — the batch twin of the
    stateful-streaming session operator (streaming/sessions.py). Extension
    beyond the reference (SURVEY §2.12); one shuffle on user_id, then two
    window passes and an aggregate over the same partitioning."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).withColumn("us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


# ---------------------------------------------------------------------------
# Structured Streaming (real readStream plans; hourly counts oracle-checked,
# stateful sessionization rows-only — not SQL-expressible)
# ---------------------------------------------------------------------------

@_register(
    "streaming_events_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts through an actual streaming query (readStream
    → window agg → memory sink, availableNow) — result must equal the
    batch SQL."""
    from gene_level_metadata_pipeline_spark.streaming.windows import (
        hourly_event_counts_stream,
    )

    return hourly_event_counts_stream(spark, sf_dir)


@_register(
    "streaming_stream_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_s
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q_streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time interval join (clicks × purchases within
    30 min, watermarks on both sides bounding join state) run to
    completion with availableNow — must equal the batch interval join the
    oracle runs."""
    from gene_level_metadata_pipeline_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    return stream_stream_interval_join(spark, sf_dir, minutes=30)


@_register(
    "streaming_outer_join",
    oracle="""
    SELECT * FROM (VALUES
      ('c1', 'p1', CAST(1 AS BIGINT), CAST(600 AS BIGINT)),
      ('c2', CAST(NULL AS VARCHAR), CAST(2 AS BIGINT), CAST(NULL AS BIGINT))
    ) AS t(click_id, purchase_id, user_id, lag_s)
    """,
)
def q_streaming_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join over a deterministic multi-batch
    stream: the matched click emits inline; the unmatched click emits
    NULL-padded only after the watermark passes its 30-minute match
    horizon (one batch behind the advance); far-future rows whose
    horizons are still open at query end are provably withheld. The
    VALUES oracle pins all three behaviors."""
    from gene_level_metadata_pipeline_spark.streaming.windows import (
        stream_outer_join_demo,
    )

    return stream_outer_join_demo(spark)


@_register(
    "streaming_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sessions AS (
      SELECT user_id, event_id, us,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState gap-sessionization (30-min timeout) — the
    custom stateful streaming operator. The bounded replay ends with a
    watermark-punctuation flush (streaming/windows.py
    ``_stage_with_flush_sentinel``) that drains every open session, so
    the streaming result is provably identical to the batch twin
    ``sessionize`` and shares its (re-shaped) oracle."""
    from gene_level_metadata_pipeline_spark.streaming.windows import sessionize_stream

    return sessionize_stream(spark, sf_dir)


# ---------------------------------------------------------------------------
# Scale-out extensions — deduplication (SURVEY §7 Phase 7)
# ---------------------------------------------------------------------------

# Shared DuckDB CTE: distinct word 3-gram shingles of `documents`, matching
# operators.dedup.word_shingles exactly.
_SHINGLE_CTE = """
    words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
      FROM words, (SELECT unnest(generate_series(1, len(ws)-2)) AS i)
      WHERE len(ws) >= 3
    )
"""


@_register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, min-id canonical."""
    from gene_level_metadata_pipeline_spark.operators.dedup import dedup_exact

    return dedup_exact(_t(spark, sf_dir, "documents"), "text", "doc_id")


@_register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH words AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, lang, array_to_string(ws[i:i+2], ' ') AS shingle
      FROM words, (SELECT unnest(generate_series(1, len(ws)-2)) AS i)
      WHERE len(ws) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.1
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, BLOCKED on language — the scale
    lever for exact similarity (only same-lang docs are compared; shrinks
    every shingle bucket by the blocking factor). Threshold 0.1 so the
    synthetic corpus, which has no true near-dups, still yields rows."""
    from gene_level_metadata_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, threshold=0.1, block_by="lang",
    )


def _minhash_oracle(num_hashes: int = 8, bands: int = 4) -> str:
    rows = num_hashes // bands
    mins = ",\n             ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(num_hashes)
    )
    band_selects = "\n      UNION ALL\n      ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS band_hash FROM sig".format(
            b=b,
            concat=" || ',' || ".join(f"h{b * rows + j}" for j in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
    WITH {_SHINGLE_CTE},
    sig AS (
      SELECT doc_id,
             {mins}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {band_selects}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """


@_register("dedup_minhash_lsh", oracle=_minhash_oracle())
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH banding(4×2) candidate pairs. String-valued minhash
    (lexicographic min of seeded md5 hex) keeps the oracle hash-exact."""
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        minhash_candidate_pairs,
    )

    return minhash_candidate_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, num_hashes=8, bands=4,
    )


def _simhash_oracle(bits: int = 16) -> str:
    hv = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(w), {k + 1}, 1)) - 1) * {16 ** (3 - k)}"
        for k in range(4)
    )
    bit_sums = ",\n             ".join(
        f"sum(cnt * (((hv // {2 ** j}) % 2) * 2 - 1)) AS s{j}" for j in range(bits)
    )
    sig = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(bits)
    )
    return f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    counted AS (
      SELECT doc_id, w, count(*) AS cnt, {hv} AS hv
      FROM tokens GROUP BY doc_id, w
    ),
    sums AS (
      SELECT doc_id,
             {bit_sums}
      FROM counted GROUP BY doc_id
    )
    SELECT doc_id, {sig} AS simhash FROM sums
    """


@_register("dedup_simhash", oracle=_simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signatures — count-weighted ±1 bit votes over md5
    token hashes, pure hex-digit arithmetic on both engines."""
    from gene_level_metadata_pipeline_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"), "text", "doc_id")


# ---------------------------------------------------------------------------
# Scale-out extensions — similarity search over embeddings
# ---------------------------------------------------------------------------

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@_register(
    "ann_brute_force_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             round({_COS.format(a='q.qe', b='v.e')}, 4) AS cos_sim
      FROM q JOIN v ON q.query_id <> v.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q_ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors: broadcast query set,
    JVM-side zip_with/aggregate dot products, one window rank."""
    from gene_level_metadata_pipeline_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


def _bucket_sql(col: str, planes: int = 4) -> str:
    return " + ".join(
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(planes)
    )


@_register(
    "ann_sign_lsh_pairs",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
           round({_COS.format(a='a.e', b='c.e')}, 4) AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE round({_COS.format(a='a.e', b='c.e')}, 4) >= 0.15
    """,
)
def q_ann_sign_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed near-neighbor pairs (threshold 0.15 — the random
    synthetic embeddings top out near 0.2 cosine). Bucket id is the
    shuffle key: the scale path for all-pairs similarity."""
    from gene_level_metadata_pipeline_spark.operators.similarity import sign_lsh_pairs

    return sign_lsh_pairs(
        _t(spark, sf_dir, "embeddings"), planes=4, threshold=0.15
    )


@_register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH RECURSIVE b AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, c.vec_id AS vec_b
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      WHERE round({_COS.format(a='a.e', b='c.e')}, 4) >= 0.15
    ),
    edges2 AS (
      SELECT vec_a AS u, vec_b AS v FROM pairs
      UNION
      SELECT vec_b, vec_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges2
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges2 e ON r.v = e.u
    ),
    comp AS (SELECT u AS vid, least(u, min(v)) AS component FROM reach GROUP BY u)
    SELECT emb.vec_id,
           coalesce(comp.component, emb.vec_id) AS canonical_id,
           emb.vec_id = coalesce(comp.component, emb.vec_id) AS is_canonical
    FROM embeddings emb LEFT JOIN comp ON emb.vec_id = comp.vid
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate removal: sign-LSH candidate pairs →
    exact cosine ≥ τ → connected components → canonical min-id per cluster.
    Completes the dedup family (exact/Jaccard/MinHash/SimHash/embedding).
    Oracle replays the identical buckets + pairs, then reaches the same
    component fixpoint with a recursive CTE."""
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        embedding_near_dup,
    )

    return embedding_near_dup(
        _t(spark, sf_dir, "embeddings"), planes=4, threshold=0.15
    )


# ---------------------------------------------------------------------------
# Scale-out extensions — text analysis
# ---------------------------------------------------------------------------

def _hits_sql(vocab: list[str]) -> str:
    inlist = ", ".join(f"'{w}'" for w in vocab)
    return (
        "len(list_filter(string_split(text, ' '), w_ -> w_ IN (" + inlist + ")))"
    )


def _lang_id_oracle() -> str:
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        LANGS,
        STOPWORDS,
    )

    hits = ",\n           ".join(
        f"{_hits_sql(STOPWORDS[lang])} AS hits_{lang}" for lang in LANGS
    )
    arms = []
    for i, lang in enumerate(LANGS[:-1]):
        cond = " AND ".join(
            f"hits_{lang} >= hits_{other}" for other in LANGS[i + 1:]
        )
        arms.append(f"WHEN {cond} THEN '{lang}'")
    case = "CASE " + " ".join(arms) + f" ELSE '{LANGS[-1]}' END"
    return f"""
    WITH scored AS (
      SELECT doc_id,
           {hits}
      FROM documents
    )
    SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
           {case} AS predicted_lang
    FROM scored
    """


@_register("text_lang_id", oracle=_lang_id_oracle())
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID with fixed tie order — the n-gram-heuristic
    detector, fully vectorized array lambdas."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import lang_id

    return lang_id(_t(spark, sf_dir, "documents"), "text", "doc_id")


@_register(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_words,
           round(length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 3) AS avg_word_len,
           round({_hits_sql(["the", "a", "of", "and", "to"])} * 1.0 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           (len(string_split(text, ' ')) >= 5 AND len(string_split(text, ' ')) <= 100000
            AND length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')) < 12.0) AS quality_ok
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / word-shape / stopword-density quality scoring."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"), "text", "doc_id")


@_register(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS bpe_tokens
    FROM documents
    """,
)
def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import token_counts

    return token_counts(_t(spark, sf_dir, "documents"), "text", "doc_id")


@_register(
    "text_fingerprint",
    oracle=f"""
    WITH {_SHINGLE_CTE}
    SELECT doc_id, min(md5(shingle)) AS fingerprint
    FROM sh GROUP BY doc_id
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hash MinHash document fingerprint (near-dup blocking key)."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"), "text", "doc_id")


# ---------------------------------------------------------------------------
# Scale-out extensions — multimodal binary plumbing
# ---------------------------------------------------------------------------

@_register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           'image/fake' AS modality,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def q_multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata struct — the multimodal
    column contract (payload stays out of this projection)."""
    from gene_level_metadata_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
    )

    df = attach_binary_payload(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return df.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@_register(
    "multimodal_features",
    oracle="""
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS nb FROM documents)
    SELECT doc_id,
           nb AS n_bytes,
           coalesce(list_aggregate(
             list_transform(generate_series(1, nb),
               i -> (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)),
             'sum')::BIGINT, 0) AS checksum
    FROM h
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (deterministic fake featurizer standing in for the image decoder).
    The checksum doubles as an oracle check that real bytes flowed through
    the pandas batches."""
    from gene_level_metadata_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    df = attach_binary_payload(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return extract_features(df).select("doc_id", "n_bytes", "checksum")


# ---------------------------------------------------------------------------
# J3/J4 — unequal-key joins & two-hop edge decoration (STRING PPI shape)
# ---------------------------------------------------------------------------

@_register(
    "edge_decoration",
    oracle="""
    WITH edges AS (
      SELECT l_partkey AS from_key, l_suppkey AS to_key,
             round(l_extendedprice / 1000, 3) AS score
      FROM lineitem WHERE l_discount >= 0.08
    )
    SELECT p.p_name AS from_name, s.s_name AS to_name, e.score
    FROM edges e
    JOIN part p ON e.from_key = p.p_partkey
    JOIN supplier s ON e.to_key = s.s_suppkey
    """,
)
def q_edge_decoration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 unequal-key joins + J4 two-hop M:N edge decoration — the STRING
    PPI pattern (T:148-158: decorate both endpoints of an edge list via two
    joins) with the reference's score/1000 scaling (T:181). Endpoint
    dimensions broadcast; the edge list is the only big side, exactly the
    hub-skew shape AQE skew-join handles at scale."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_discount") >= 0.08)
    edges = li.select(
        F.col("l_partkey").alias("from_key"),
        F.col("l_suppkey").alias("to_key"),
        _round_to(F.col("l_extendedprice") / 1000, 3).alias("score"),
    )
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    return (
        edges.join(F.broadcast(p), edges.from_key == p.p_partkey)
        .join(F.broadcast(s), edges.to_key == s.s_suppkey)
        .select(
            F.col("p_name").alias("from_name"),
            F.col("s_name").alias("to_name"),
            "score",
        )
    )


@_register(
    "transpose_matrix",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price,
             CAST(round(sum(CAST(l_tax AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_tax
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'sum_qty' AS metric,
           max(CASE WHEN l_returnflag = 'A' THEN sum_qty END) AS "A",
           max(CASE WHEN l_returnflag = 'N' THEN sum_qty END) AS "N",
           max(CASE WHEN l_returnflag = 'R' THEN sum_qty END) AS "R"
    FROM wide
    UNION ALL
    SELECT 'sum_price',
           max(CASE WHEN l_returnflag = 'A' THEN sum_price END),
           max(CASE WHEN l_returnflag = 'N' THEN sum_price END),
           max(CASE WHEN l_returnflag = 'R' THEN sum_price END)
    FROM wide
    UNION ALL
    SELECT 'sum_tax',
           max(CASE WHEN l_returnflag = 'A' THEN sum_tax END),
           max(CASE WHEN l_returnflag = 'N' THEN sum_tax END),
           max(CASE WHEN l_returnflag = 'R' THEN sum_tax END)
    FROM wide
    """,
)
def q_transpose_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 full distributed transpose — the t() the reference does in RAM
    (TW:16-18): an aggregate matrix (flags × metrics) flipped to
    (metrics × flags) via melt + pivot."""
    from gene_level_metadata_pipeline_spark.operators.reshape import transpose

    wide = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            _dsum(F.col("l_extendedprice"), 2).alias("sum_price"),
            _dsum(F.col("l_tax"), 2).alias("sum_tax"),
        )
    )
    return transpose(wide, "l_returnflag", ["sum_qty", "sum_price", "sum_tax"],
                     header_col="metric")


@_register(
    "distinct_count",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct aggregation (the expand-based plan Spark
    generates for several COUNT DISTINCTs in one pass)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@_register(
    "rollup_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregation (region → nation → grand total) — free
    from Spark's grouping-sets support, absent from the reference (SURVEY
    §2.7 'absent' list) but table stakes for an analytics engine."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        _dsum(F.col("c_acctbal"), 2).alias("total_balance")
    )


@_register(
    "phenotype_parse",
    oracle="""
    WITH pheno AS (
      SELECT p_partkey,
             CASE p_size % 4
               WHEN 0 THEN '{' || p_name || '}'
               WHEN 1 THEN '[' || p_name || ']'
               WHEN 2 THEN '?' || p_name
               ELSE p_name END
             || ', ' || CAST(100000 + p_partkey AS VARCHAR)
             || ' (' || CAST(1 + p_partkey % 4 AS VARCHAR) || '), '
             || CASE p_size % 3
                  WHEN 0 THEN 'Autosomal dominant'
                  WHEN 1 THEN 'Autosomal recessive; X-linked'
                  ELSE 'Multifactorial' END AS s
      FROM part
    )
    SELECT p_partkey,
           array_to_string(regexp_extract_all(
             s, 'Autosomal dominant|Autosomal recessive|X-linked|Multifactorial'
           ), '; ') AS moi,
           nullif(regexp_extract(s, '(\\d{6})', 1), '') AS omim_id,
           regexp_extract(s, '^(.*?)\\d{6}', 1) AS raw_name,
           CASE WHEN regexp_matches(s, '^\\{') THEN 'susceptibility'
                WHEN regexp_matches(s, '^\\[') THEN 'nondisease'
                WHEN regexp_matches(s, '^\\?') THEN 'provisional'
                ELSE 'confirmed' END AS certainty,
           CASE regexp_extract(s, '\\((\\d)\\)', 1)
                WHEN '1' THEN 'mapping_wildtype' WHEN '2' THEN 'linkage'
                WHEN '3' THEN 'molecular_basis_known' ELSE 'chromosome_deletion'
           END AS mapping_key,
           regexp_replace(
             regexp_replace(s, '[\\{\\[\\?\\]\\}]', '', 'g'), ', $', ''
           ) AS cleaned
    FROM pheno
    """,
)
def q_phenotype_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hardest scalar pipeline — OMIM genemap2 packed
    phenotype strings (T:349-402): X9 extract-all MOI keywords joined
    '; ', X7 6-digit id extract with NULL no-match, X8 lazy prefix extract
    (Java lookahead '(?=\\d{6})' in Spark; RE2 has no lookahead so the
    oracle uses the equivalent lazy captured group), X10 leading-class
    recode {/[/? , X17 mapping-key recode (1)-(4), X4/X5 char-class strip
    + trailing-comma trim. Strings are built deterministically from part."""
    from gene_level_metadata_pipeline_spark.functions.scalars import (
        extract_all_joined,
        extract_first,
    )

    p = _t(spark, sf_dir, "part")
    prefix = (
        F.when(F.col("p_size") % 4 == 0, F.concat(F.lit("{"), F.col("p_name"), F.lit("}")))
        .when(F.col("p_size") % 4 == 1, F.concat(F.lit("["), F.col("p_name"), F.lit("]")))
        .when(F.col("p_size") % 4 == 2, F.concat(F.lit("?"), F.col("p_name")))
        .otherwise(F.col("p_name"))
    )
    moi_src = (
        F.when(F.col("p_size") % 3 == 0, F.lit("Autosomal dominant"))
        .when(F.col("p_size") % 3 == 1, F.lit("Autosomal recessive; X-linked"))
        .otherwise(F.lit("Multifactorial"))
    )
    s = F.concat(
        prefix, F.lit(", "),
        (F.lit(100000) + F.col("p_partkey")).cast("string"),
        F.lit(" ("), (1 + F.col("p_partkey") % 4).cast("string"), F.lit("), "),
        moi_src,
    )
    d = p.select("p_partkey", s.alias("s"))
    moi_pat = "Autosomal dominant|Autosomal recessive|X-linked|Multifactorial"
    return d.select(
        "p_partkey",
        extract_all_joined("s", moi_pat).alias("moi"),
        extract_first("s", r"(\d{6})").alias("omim_id"),
        F.regexp_extract("s", r"^(.*?)(?=\d{6})", 1).alias("raw_name"),
        F.when(F.col("s").rlike(r"^\{"), "susceptibility")
        .when(F.col("s").rlike(r"^\["), "nondisease")
        .when(F.col("s").rlike(r"^\?"), "provisional")
        .otherwise("confirmed").alias("certainty"),
        F.when(F.regexp_extract("s", r"\((\d)\)", 1) == "1", "mapping_wildtype")
        .when(F.regexp_extract("s", r"\((\d)\)", 1) == "2", "linkage")
        .when(F.regexp_extract("s", r"\((\d)\)", 1) == "3", "molecular_basis_known")
        .otherwise("chromosome_deletion").alias("mapping_key"),
        F.regexp_replace(
            F.regexp_replace("s", r"[\{\[\?\]\}]", ""), r", $", ""
        ).alias("cleaned"),
    ).drop("s")


@_register(
    "panelapp_flow",
    oracle="""
    SELECT * FROM (VALUES
      ('g1', 'green', 'cardiac'),
      ('g2', 'amber', 'neuro'),
      ('g3', 'red',   '-')
    ) AS t(gene_symbol, confidence, disease_group)
    """,
)
def q_panelapp_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full PanelApp tidy flow (T:441-498) as one engine program:
    paginated JSON → flatten to (record_id, name, value) → filter to the
    key set → RECORD-ID pivot (replacing the reference's fragile
    positional col-bind, T:454-484) → NA→'-' fill (T:451) → confidence
    recode 3/2/1→green/amber/red (T:486-491) → drop empty disease_group
    rows (T:493)."""
    from gene_level_metadata_pipeline_spark.functions.scalars import (
        fill_sentinel,
        recode,
    )
    from gene_level_metadata_pipeline_spark.operators.reshape import kv_pivot
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_json_pages

    d = fixture_dir()
    kv = read_json_pages(
        spark, [f"{d}/panel_pages/p1.json", f"{d}/panel_pages/p2.json"],
        flatten_kv=True, record_id="rid",
    )
    wide = kv_pivot(
        kv, "rid", "name", "value",
        names=["gene_symbol", "confidence_level", "disease_group"],
    )
    filled = fill_sentinel(wide, "-", cols=["disease_group"])
    out = filled.select(
        "gene_symbol",
        recode("confidence_level",
               {"3": "green", "2": "amber", "1": "red"}).alias("confidence"),
        "disease_group",
    )
    return out.where(F.col("disease_group") != "")


@_register(
    "ann_ivf_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, label, e AS qe FROM v WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             round({_COS.format(a='q.qe', b='v.e')}, 4) AS cos_sim
      FROM q JOIN v ON q.label = v.label AND q.query_id <> v.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: each query searches only its coarse cell (the label
    column stands in for a k-means centroid assignment) — the scale path
    where brute force scores N candidates and IVF scores N/cells."""
    from gene_level_metadata_pipeline_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.where(F.col("vec_id") < 10), cell_col="label", k=5)


@_register(
    "ann_ivf_recall",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, label, e AS qe FROM v WHERE vec_id < 10),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round({_COS.format(a='q.qe', b='v.e')}, 4) DESC,
                          v.vec_id
               ) AS rank
        FROM q JOIN v ON q.query_id <> v.vec_id
      ) WHERE rank <= 5
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round({_COS.format(a='q.qe', b='v.e')}, 4) DESC,
                          v.vec_id
               ) AS rank
        FROM q JOIN v ON q.label = v.label AND q.query_id <> v.vec_id
      ) WHERE rank <= 5
    ),
    tp AS (
      SELECT count(*) AS n_tp FROM bf JOIN ivf USING (query_id, neighbor_id)
    )
    SELECT (SELECT count(*) FROM bf) AS n_truth,
           (SELECT count(*) FROM ivf) AS n_ivf,
           n_tp,
           round(n_tp * 1.0 / (SELECT count(*) FROM bf), 4) AS recall
    FROM tp
    """,
)
def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF index evaluating ITSELF (same methodology as
    lsh_quality_metrics): recall@5 of the cell-restricted search against
    exact brute-force truth over the same 10 queries. Both sides share
    the deterministic (rounded-cosine DESC, neighbor_id) tie-break, so
    the metric is bit-stable. This is the calibration run an IVF
    deployment does on a sample before committing to a cell count at
    100 TB — recall here is bounded by cell-assignment quality, and a
    too-coarse quantizer shows up as a recall cliff, not a silent wrong
    answer."""
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    truth = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = ivf_topk(emb, queries, cell_col="label", k=5).select(
        "query_id", "neighbor_id"
    )
    tp = truth.join(approx, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_tp")
    )
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_ivf = approx.agg(F.count(F.lit(1)).alias("n_ivf"))
    return (
        n_truth.join(n_ivf).join(tp)
        .select(
            "n_truth", "n_ivf", "n_tp",
            _round_to(F.col("n_tp") / F.col("n_truth"), 4).alias("recall"),
        )
    )


# Shared DuckDB CTE chain: one deterministic Lloyd iteration from the
# vec_id<8 seeds to learned centroids and final cell assignments —
# mirrors similarity.kmeans_centroids/assign_cells exactly (rounded-4dp
# cosine argmax with lowest-cid ties; DECIMAL(25,12) component means
# rounded to 6dp so both engines derive bit-identical centroids).
_IVF_KMEANS_CTES = f"""
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    seeds AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, s.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round({_COS.format(a='v.e', b='s.ce')}, 4) DESC, s.cid
               ) AS rn
        FROM v CROSS JOIN seeds s
      ) WHERE rn = 1
    ),
    el AS (
      SELECT a1.cid, generate_subscripts(v.e, 1) AS pos, unnest(v.e) AS x
      FROM v JOIN a1 USING (vec_id)
    ),
    cm AS (
      SELECT cid, pos,
             round(CAST(sum(CAST(x AS DECIMAL(25,12))) AS DOUBLE) / count(*), 6) AS m
      FROM el GROUP BY cid, pos
    ),
    cent AS (SELECT cid, array_agg(m ORDER BY pos) AS ce FROM cm GROUP BY cid),
    cells AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT v.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round({_COS.format(a='v.e', b='c.ce')}, 4) DESC, c.cid
               ) AS rn
        FROM v CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    vv AS (SELECT v.vec_id, v.e, cells.cell FROM v JOIN cells USING (vec_id))
"""


def _ivf_kmeans_cells(spark: SparkSession, sf_dir: str):
    """Embeddings decorated with learned IVF cells (k=8, one Lloyd
    iteration from the lowest-id seeds)."""
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        assign_cells,
        kmeans_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb, k=8, iters=1)
    return assign_cells(emb, cent)


@_register(
    "ann_ivf_kmeans_topk",
    oracle=f"""
    WITH {_IVF_KMEANS_CTES},
    q AS (SELECT vec_id AS query_id, e AS qe, cell FROM vv WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, vv.vec_id AS neighbor_id,
             round({_COS.format(a='q.qe', b='vv.e')}, 4) AS cos_sim
      FROM q JOIN vv ON q.cell = vv.cell AND q.query_id <> vv.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q_ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a REAL learned coarse quantizer: k-means centroids (one
    deterministic Lloyd iteration, similarity.kmeans_centroids) assign
    every vector a cell; each query searches only its cell. Same plan
    shape as ann_ivf_topk but the cells now come from the data, not a
    pre-assigned label — the production IVF build path."""
    from gene_level_metadata_pipeline_spark.operators.similarity import ivf_topk

    vv = _ivf_kmeans_cells(spark, sf_dir)
    return ivf_topk(
        vv, vv.where(F.col("vec_id") < 10), cell_col="cell", k=5
    )


@_register(
    "ann_ivf_kmeans_recall",
    oracle=f"""
    WITH {_IVF_KMEANS_CTES},
    q AS (SELECT vec_id AS query_id, e AS qe, cell FROM vv WHERE vec_id < 10),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round({_COS.format(a='q.qe', b='v.e')}, 4) DESC,
                          v.vec_id
               ) AS rank
        FROM q JOIN v ON q.query_id <> v.vec_id
      ) WHERE rank <= 5
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, vv.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round({_COS.format(a='q.qe', b='vv.e')}, 4) DESC,
                          vv.vec_id
               ) AS rank
        FROM q JOIN vv ON q.cell = vv.cell AND q.query_id <> vv.vec_id
      ) WHERE rank <= 5
    ),
    tp AS (
      SELECT count(*) AS n_tp FROM bf JOIN ivf USING (query_id, neighbor_id)
    )
    SELECT (SELECT count(*) FROM bf) AS n_truth,
           (SELECT count(*) FROM ivf) AS n_ivf,
           n_tp,
           round(n_tp * 1.0 / (SELECT count(*) FROM bf), 4) AS recall
    FROM tp
    """,
)
def q_ann_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the LEARNED-centroid IVF (ann_ivf_kmeans_topk) against
    exact brute-force truth — the calibration run an IVF deployment does
    before committing to a cell count. The learned quantizer should meet
    or beat the pre-assigned-label cells of ann_ivf_recall: k-means cells
    follow the data's actual density, labels don't have to."""
    from gene_level_metadata_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    vv = _ivf_kmeans_cells(spark, sf_dir)
    queries = vv.where(F.col("vec_id") < 10)
    truth = brute_force_topk(
        vv.drop("cell"), queries.drop("cell"), k=5
    ).select("query_id", "neighbor_id")
    approx = ivf_topk(vv, queries, cell_col="cell", k=5).select(
        "query_id", "neighbor_id"
    )
    tp = truth.join(approx, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_tp")
    )
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_ivf = approx.agg(F.count(F.lit(1)).alias("n_ivf"))
    return (
        n_truth.join(n_ivf).join(tp)
        .select(
            "n_truth", "n_ivf", "n_tp",
            _round_to(F.col("n_tp") / F.col("n_truth"), 4).alias("recall"),
        )
    )


@_register(
    "read_excel_sheet",
    oracle="""
    SELECT * FROM (VALUES
      ('g1', CAST(1.5 AS DOUBLE)), ('g2', CAST(2.5 AS DOUBLE))
    ) AS t(gene, score)
    """,
)
def q_read_excel_sheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 Excel scan — sheet by index, pure-stdlib xlsx fallback (zipped
    XML; no Excel engine in this container). Sheet-by-name + startRow is
    covered by unit tests (tests/test_sources.py)."""
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_excel

    return read_excel(spark, f"{fixture_dir()}/workbook.xlsx", sheet=0)


@_register(
    "salted_count",
    oracle="SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
)
def q_salted_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase count: the salting pattern for hot aggregation
    keys (SURVEY §4 skew watchpoints) — partial counts per (key, salt),
    final sum per key. Result must equal the plain GROUP BY."""
    from gene_level_metadata_pipeline_spark.operators.skew import salted_count

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag")
    return salted_count(li, ["l_returnflag"], salt_buckets=16)


@_register(
    "median_quantiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_median_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group — Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the linear-interpolation definition, so
    they agree exactly (unlike approx_percentile, whose sketch is
    engine-specific and deliberately not used where exactness is graded).
    At 100 TB swap to approx_percentile and accept the error bound."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _round_to(F.expr("percentile(l_quantity, 0.5)"), 4).alias("med_qty"),
        _round_to(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25_price"),
        _round_to(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75_price"),
    )


@_register(
    "streaming_late_data",
    oracle="""
    SELECT * FROM (VALUES
      ('2024-01-01 01:00:00', CAST(2 AS BIGINT)),
      ('2024-01-01 02:00:00', CAST(1 AS BIGINT))
    ) AS t(hour, n)
    """,
)
def q_streaming_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark + append-mode late-data semantics (SURVEY §2.12
    'watermarks + windowed aggs for late data'): a deterministic two-batch
    stream where an event arriving behind the watermark is DROPPED — the
    closed hour-1 window counts 2, not 3. The VALUES oracle certifies the
    exact late-data contract."""
    from gene_level_metadata_pipeline_spark.streaming.windows import (
        late_data_window_counts,
    )

    return late_data_window_counts(spark)


# ---------------------------------------------------------------------------
# TPC-H-shaped subquery/aggregation breadth (Q4/Q13/Q14/Q18/Q19 analogs)
# ---------------------------------------------------------------------------

@_register(
    "tpch_q4_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery = left-semi join on the
    composite condition, then priority counts."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    sem = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@_register(
    "tpch_q13_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q_tpch_q13_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left join with an extra join predicate + two-level
    aggregation (orders-per-customer distribution). count(col) counts only
    matched rows — NULL-skipping semantics must survive the outer join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_register(
    "tpch_q14_conditional",
    oracle="""
    SELECT round(
      100.0 * CAST(sum(CASE WHEN p_type = 'ECONOMY'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
      / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
    4) AS economy_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
)
def q_tpch_q14_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (promo-revenue share) with
    a broadcast dimension join; exact decimal sums keep the ratio
    engine-identical."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    economy = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return j.agg(
        _round_to(
            100.0 * F.sum(economy).cast("double") / F.sum(rev).cast("double"), 4
        ).alias("economy_pct")
    )


@_register(
    "tpch_q18_having",
    oracle="""
    SELECT o.o_orderkey, round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    HAVING sum(l.l_quantity) > 150
    """,
)
def q_tpch_q18_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING = filter-after-aggregate (large-volume
    orders). The reference expresses having as count-then-filter (§2.7
    note); same thing here at fact scale."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    g = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(o.o_orderkey)
        .agg(
            F.sum("l_quantity").alias("__q"),
            _dsum(F.col("l_quantity"), 2).alias("total_qty"),
        )
    )
    return g.where(F.col("__q") > 150).select("o_orderkey", "total_qty")


@_register(
    "tpch_q19_or_pushdown",
    oracle="""
    SELECT round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)::DOUBLE AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
       OR (p_type = 'STANDARD' AND l_quantity >= 30)
    """,
)
def q_tpch_q19_or_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates spanning both
    join sides — the OR-pushdown stress (Catalyst distributes the
    single-side conjuncts to the scans)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 40))
        | ((F.col("p_type") == "STANDARD") & (F.col("l_quantity") >= 30))
    )
    return j.where(cond).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue")
    )


@_register(
    "tpch_q17_scalar_correlated",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2)
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN per_part USING (l_partkey)
    WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
    """,
)
def q_tpch_q17_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a grouped aggregate + re-join — exactly
    what Catalyst's RewriteCorrelatedScalarSubquery does; writing the
    decorrelated form directly keeps the plan explicit. The per-part
    averages are exact (integral quantities sum exactly in doubles), so no
    rounding is needed before the comparison."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select("p_partkey")
    pruned = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    per_part = pruned.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        pruned.join(per_part, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            _round_to(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@_register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)::DOUBLE
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + uncorrelated scalar subquery
    (global max) consumed as a filter. The scalar lands as a broadcast of
    a 1-row DataFrame — no second pass over the fact table. Comparing the
    *rounded* revenues keeps the max-equality engine-independent."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_register(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to this schema's columns: l_returnflag='R'
    plays the late-delivery role): correlated EXISTS → left-semi join with
    a non-equi conjunct, correlated NOT EXISTS → left-anti join with a
    non-equi conjunct, both on the order key, then a count aggregate.
    The semi/anti probe sides shuffle on l_orderkey — one exchange reused
    by both joins."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.where(F.col("l_returnflag") == "R").alias("l3")
    base = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
    )
    return base.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


@_register(
    "tpch_q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nation,
           count(*) AS numcust,
           round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2)::DOUBLE AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (average positive
    balance, exact-decimal so both engines derive the identical double)
    gating a NOT EXISTS anti join against the fact table, then a per-nation
    aggregate. The scalar is a broadcast 1-row cross join; the anti join
    shuffles on custkey. (This synthetic data gives every customer orders,
    so the anti-join predicate is 'no URGENT order' to keep the result
    non-trivial.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    ab = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("ab")
        )
    )
    return (
        c.crossJoin(F.broadcast(ab))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@_register(
    "window_rank_suite",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER wd AS BIGINT) AS rnk,
           CAST(dense_rank() OVER wd AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           round(cume_dist() OVER w, 6) AS cd,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER m AS DOUBLE)
                 / (count(*) OVER m), 2) AS mov_avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey),
           wd AS (PARTITION BY o_orderpriority ORDER BY o_orderdate),
           m AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth in one plan: row_number / rank / dense_rank
    (tied ordering), ntile, lag/lead, cume_dist, and a 3-row moving average
    (frame clause) — one shuffle on the partition key serves every window
    because all specs share PARTITION BY o_orderpriority. Moving average
    uses the exact-decimal running sum so partial-agg order can't perturb
    the last ulp (see _dsum)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    wd = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    m = w.rowsBetween(-2, 0)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(wd).cast("long").alias("rnk"),
        F.dense_rank().over(wd).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        _round_to(F.cume_dist().over(w), 6).alias("cd"),
        _round_to(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(m).cast("double")
            / F.count(F.lit(1)).over(m),
            2,
        ).alias("mov_avg3"),
    )


@_register(
    "applyinpandas_normalize",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_acctbal,
           round(CASE WHEN max(c_acctbal) OVER w = min(c_acctbal) OVER w THEN 0.0
                ELSE (c_acctbal - min(c_acctbal) OVER w)
                     / (max(c_acctbal) OVER w - min(c_acctbal) OVER w) END, 6) AS norm
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey)
    """,
)
def q_applyinpandas_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (per-nation min-max normalization of
    account balances) — the Arrow-batched Pandas-UDF path, certified
    against a pure-SQL window oracle (min/max are summation-free, so the
    two computations agree exactly)."""
    from gene_level_metadata_pipeline_spark.operators.multimodal import (
        normalize_per_group,
    )

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"), "c_acctbal"
    )
    out = normalize_per_group(c, "c_nationkey", "c_acctbal", out_col="norm")
    return out.withColumn("norm", F.round("norm", 6))


@_register(
    "sql_api_catalog",
    oracle="""
    SELECT n.n_name, count(*) AS n_cust, round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2)::DOUBLE AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_sql_api_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end surface: tables registered through the engine
    Catalog (the explicit replacement for the reference's R global env,
    SURVEY §1.1) and queried with spark.sql — DataFrame and SQL APIs share
    one namespace."""
    from gene_level_metadata_pipeline_spark.plans.catalog import Catalog

    cat = Catalog(spark)
    cat.put("customer_v", _t(spark, sf_dir, "customer"))
    cat.put("nation_v", _t(spark, sf_dir, "nation"))
    return spark.sql("""
        SELECT n.n_name, count(*) AS n_cust,
               CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
        FROM customer_v c JOIN nation_v n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """)


@_register(
    "recursive_hierarchy",
    oracle="""
    WITH RECURSIVE anc(suppkey, node) AS (
      SELECT s_suppkey, s_suppkey FROM supplier
      UNION ALL
      SELECT suppkey, CAST(FLOOR(node / 2) AS BIGINT) FROM anc WHERE node > 1
    )
    SELECT suppkey, count(*) AS chain_len, min(node) AS root
    FROM anc GROUP BY suppkey
    """,
)
def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native WITH RECURSIVE (Spark 4): walk each supplier's ancestor
    chain in the implicit binary hierarchy parent(k)=floor(k/2) down to
    the root. Iterative-fixpoint queries the engine previously expressed
    as driver-side loops (connected_components, pagerank) get a SQL
    front-end form; DuckDB runs the IDENTICAL text. Recursion depth is
    log2(max suppkey) — far under Spark's 100-level default limit; each
    level is one self-join the optimizer plans like any other."""
    from gene_level_metadata_pipeline_spark.plans.catalog import Catalog

    cat = Catalog(spark)
    cat.put("supplier_rh", _t(spark, sf_dir, "supplier"))
    return spark.sql("""
        WITH RECURSIVE anc(suppkey, node) AS (
          SELECT s_suppkey, s_suppkey FROM supplier_rh
          UNION ALL
          SELECT suppkey, CAST(FLOOR(node / 2) AS BIGINT) FROM anc WHERE node > 1
        )
        SELECT suppkey, count(*) AS chain_len, min(node) AS root
        FROM anc GROUP BY suppkey
    """)


@_register(
    "upsert_merge",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
    ),
    kept AS (
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
    )
    SELECT * FROM kept UNION ALL SELECT * FROM updates
    """,
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert emulation (updates replace same-key rows, both
    sides' unmatched rows survive) — the incremental bronze refresh the
    reference lacks (it re-fetches whole sources per release)."""
    from gene_level_metadata_pipeline_spark.operators.harmonize import upsert

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    updates = (
        c.where(F.col("c_custkey") % 10 == 0)
        .withColumn("c_mktsegment", F.lit("UPDATED"))
    )
    return upsert(c, updates, "c_custkey")


@_register(
    "streaming_dedup",
    oracle="SELECT DISTINCT user_id FROM events",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: dropDuplicates on an unbounded
    stream (state = seen keys; pair with a watermark via
    dropDuplicatesWithinWatermark when keys can expire). Output projected
    to the key set so the result is order-independent and oracle-exact."""
    import uuid as _uuid

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dedup = src.select("user_id").dropDuplicates(["user_id"])
    name = f"stream_dedup_{_uuid.uuid4().hex[:8]}"
    q = (
        dedup.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    rows = out.collect()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, out.schema)


@_register(
    "streaming_dedup_watermark",
    oracle="""
    SELECT * FROM (VALUES
      ('e1', 'k1'), ('e2', 'k2'), ('e3', 'k9'), ('e4', 'k8'), ('e5', 'k1')
    ) AS t(event_id, k)
    """,
)
def q_streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over a deterministic multi-batch
    stream: the bounded-state exact-dedup contract. The VALUES oracle
    pins both observables — a near-duplicate inside the watermark delay
    is suppressed (e2dup never appears), and a key re-sent after its
    state expired emits a second time (k1 appears as BOTH e1 and e5).
    Plain streaming dropDuplicates (streaming_dedup) can never emit that
    fifth row; its state also never shrinks."""
    from gene_level_metadata_pipeline_spark.streaming.windows import (
        stream_dedup_within_watermark_demo,
    )

    return stream_dedup_within_watermark_demo(spark)


# ---------------------------------------------------------------------------
# Temporal joins — as-of and range (operators Spark lacks natively)
# ---------------------------------------------------------------------------

@_register(
    "asof_join_events",
    oracle="""
    WITH err AS (
      SELECT user_id, event_id, epoch_us(ts) AS ets FROM events
      WHERE event_type = 'error'
    ),
    clk AS (
      SELECT user_id, epoch_us(ts) AS cts, value FROM events
      WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT e.user_id, e.event_id,
             c.cts, c.value,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY c.cts DESC, c.value DESC) AS rn
      FROM err e LEFT JOIN clk c
        ON e.user_id = c.user_id AND c.cts <= e.ets
    )
    SELECT user_id, event_id,
           value AS right_value,
           cts AS right_us
    FROM ranked WHERE rn = 1
    """,
)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every 'error' event, the most recent 'click' by the
    same user at or before it. Implemented as tag-union + running
    last(ignorenulls) window — one shuffle, no range self-join blowup
    (the oracle uses the quadratic correlated form; same answer)."""
    from gene_level_metadata_pipeline_spark.operators.temporal import as_of_join

    ev = _events(spark, sf_dir).withColumn("us", F.unix_micros("ts"))
    err = ev.where(F.col("event_type") == "error").select(
        "user_id", "event_id", F.col("us")
    )
    clk = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("us"), "value"
    )
    out = as_of_join(err, clk, on="user_id", left_ts="us", right_ts="us",
                     tie_break=["value"])
    return out.select(
        "user_id", "event_id", "right_value", F.col("right_us")
    )


@_register(
    "range_join_bands",
    oracle="""
    WITH bands AS (
      SELECT * FROM (VALUES
        ('tiny', CAST(0 AS DOUBLE), CAST(50 AS DOUBLE)),
        ('small', CAST(50 AS DOUBLE), CAST(150 AS DOUBLE)),
        ('large', CAST(150 AS DOUBLE), CAST(1000 AS DOUBLE))
      ) AS t(band, lo, hi)
    )
    SELECT b.band, count(*) AS n, round(sum(CAST(e.value AS DECIMAL(18,6))), 2)::DOUBLE AS total
    FROM events e JOIN bands b ON b.lo <= e.value AND e.value < b.hi
    GROUP BY b.band
    """,
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval containment) join: events bucketed into value
    bands via a broadcast band table + non-equi predicate, then per-band
    aggregates."""
    from gene_level_metadata_pipeline_spark.operators.temporal import range_join

    ev = _events(spark, sf_dir)
    bands = spark.createDataFrame(
        [("tiny", 0.0, 50.0), ("small", 50.0, 150.0), ("large", 150.0, 1000.0)],
        ["band", "lo", "hi"],
    )
    joined = range_join(ev, bands, "value", "lo", "hi")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value"), 2).alias("total"),
    )


@_register(
    "hierarchical_rollup",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket, count(*) AS n,
             sum(CAST(value AS DECIMAL(18,6))) AS total
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT date_trunc('day', bucket) AS bucket, sum(n) AS n, sum(total) AS total
      FROM hourly GROUP BY 1
    )
    SELECT 'hour' AS grain, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           n::BIGINT AS n, round(total, 2)::DOUBLE AS total FROM hourly
    UNION ALL
    SELECT 'day', strftime(bucket, '%Y-%m-%d %H:%M:%S'), n::BIGINT, round(total, 2)::DOUBLE FROM daily
    """,
)
def q_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: hour aggregates from the facts, day
    aggregates FROM the hour partials (one fact scan; each coarser grain
    re-aggregates ~24x fewer rows — the continuous-aggregate maintenance
    shape). Decimal sums keep the re-aggregation exact."""
    from gene_level_metadata_pipeline_spark.operators.temporal import (
        hierarchical_rollup,
    )

    return hierarchical_rollup(_events(spark, sf_dir), "ts", "value")


@_register(
    "stable_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8) < '33333333'
    """,
)
def q_stable_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based 20% document sample — reproducible across
    runs/engines/partitionings (DataFrame.sample is not), the selection
    property training-data pipelines need. 0x33333333 = floor(0.2*16^8)."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import stable_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stable_sample(d, "doc_id", 0.2)


@_register(
    "dedup_components",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT doc_a, doc_b FROM (
        -- inline the minhash candidate pairs (same SQL as dedup_minhash_lsh)
        """ + _minhash_oracle() + """
      )
    ),
    edges2 AS (
      SELECT doc_a AS u, doc_b AS v FROM base
      UNION
      SELECT doc_b, doc_a FROM base
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges2
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges2 e ON r.v = e.u
    )
    SELECT u AS doc_id, least(u, min(v)) AS component
    FROM reach GROUP BY u
    """,
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash candidate pairs — the
    canonical-document clustering step of near-dup removal. Spark runs
    iterative min-label propagation (driver loop, one join+agg per round);
    the oracle reaches the same fixpoint with a recursive CTE."""
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        minhash_candidate_pairs,
    )
    from gene_level_metadata_pipeline_spark.operators.graph import connected_components

    pairs = minhash_candidate_pairs(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return connected_components(pairs)


@_register(
    "text_tfidf_keywords",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tf AS (SELECT doc_id, w, count(*) AS cnt FROM words GROUP BY doc_id, w),
    doc_len AS (SELECT doc_id, count(*) AS len FROM words GROUP BY doc_id),
    dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w,
             round((tf.cnt * 1.0 / doc_len.len) * ln(n.n_docs * 1.0 / dfreq.df), 6) AS tfidf
      FROM tf JOIN doc_len USING (doc_id) JOIN dfreq USING (w), n
    )
    SELECT doc_id, w, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, w) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def q_text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf keywords per document — tokenize → tf / df aggregates
    → broadcast df join → deterministic (score, word) ranking."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        tf_idf_keywords,
    )

    return tf_idf_keywords(_t(spark, sf_dir, "documents"), "text", "doc_id")


# ---------------------------------------------------------------------------
# TPC-H breadth, continued: every remaining query shape expressible on the
# driver schema (no partsupp table → q2/q9/q11/q16/q20 are out of scope;
# q12's l_shipmode/commitdate columns are absent → certified via an
# equivalent-shaped late-shipment variant).
# ---------------------------------------------------------------------------


def _utc(spark: SparkSession) -> None:
    """Pin the session timezone for queries that EXTRACT date parts.

    Parquet timestamps are naive; DuckDB extracts parts from the stored
    value directly, Spark through the session timezone. Only UTC makes
    year()/date_trunc() agree between the engines (same reasoning as
    _events; dynamic conf, safe to set per-query on the driver's session).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")


@_register(
    "tpch_q7_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year. Both nation dims broadcast; the only scaling shuffle is the
    lineitem⋈orders fact-fact join (customer/supplier broadcast at driver
    SF, AQE picks the strategy at real scale)."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue")
    )


@_register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_12'
                         THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share inside a region — an 8-way
    join where every dimension (part, supplier, nation×2, region)
    broadcasts and only lineitem⋈orders shuffles, then a conditional
    aggregation ratio per year (exact decimal sums on both sides of the
    divide)."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    j = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    national = F.when(F.col("supp_nation") == "NATION_12", vol).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        j.select(F.year("o_orderdate").cast("long").alias("o_year"),
                 vol.alias("volume"), national.alias("national"))
        .groupBy("o_year")
        .agg(
            _round_to(
                F.sum("national").cast("double") / F.sum("volume").cast("double"), 4
            ).alias("mkt_share")
        )
    )


@_register(
    "tpch_q10_returned",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter. Group-by on the full customer identity, deterministic top-k
    (revenue desc, custkey tiebreak → TakeOrderedAndProject, no global
    sort)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    j = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_register(
    "tpch_q12_late_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (driver schema has no l_shipmode/commitdate →
    late-shipment variant): fact-fact join with a non-equi date-arithmetic
    predicate, then a two-way conditional count by line status."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = o.join(li, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
    )


# ---------------------------------------------------------------------------
# Training-data curation, continued: repetition scoring, PII scrubbing,
# benchmark-contamination scan (operators/textanalysis.py).
# ---------------------------------------------------------------------------


@_register(
    "text_repetition",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS grams
      FROM toks
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_unique_grams,
           round(1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 4) AS dup_fraction
    FROM g WHERE len(grams) > 0
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition: duplicated-3-gram fraction
    per document. Array-native per row — a pure map stage with ZERO
    shuffles at any corpus size."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        repetition_scores,
    )

    return repetition_scores(_t(spark, sf_dir, "documents"), "text", "doc_id")


@_register(
    "text_pii_redact",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones,
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents augmented with deterministic synthetic
    contact strings (the raw corpus has none — the augmentation makes the
    regexes do real work that the oracle reproduces byte-for-byte).
    Count + redact emails and reserved-prefix phone numbers; pure per-row
    regex, no shuffle."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import pii_redact

    d = _t(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@mail.example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return pii_redact(aug, "t", "doc_id")


@_register(
    "text_contamination",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 3),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS shingle
      FROM toks
    )
    SELECT c.doc_id,
           count(DISTINCT c.shingle) AS n_shared_grams,
           count(DISTINCT b.doc_id) AS n_bench_docs
    FROM g c JOIN g b ON c.shingle = b.shingle AND b.doc_id % 97 = 0
    WHERE c.doc_id % 97 <> 0
    GROUP BY c.doc_id
    """,
)
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: 5-gram overlap between the corpus and
    a small held-out benchmark slice (doc_id % 97 == 0 stands in for an
    eval set). Benchmark shingles broadcast → the corpus side never
    shuffles before its per-doc aggregation; at 100 TB the probe stays
    map-side as long as the benchmark corpus stays dimension-sized."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        contamination_check,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0)
    cand = d.where(F.col("doc_id") % 97 != 0)
    return contamination_check(cand, bench, "text", "doc_id", n=5)


# ---------------------------------------------------------------------------
# Engine breadth, continued: higher-order array functions, time-range
# window frames, CUBE grouping sets, column profiling, fuzzy matching.
# ---------------------------------------------------------------------------


@_register(
    "array_higher_order",
    oracle="""
    WITH a AS (
      -- (l_linenumber, qty) ordering: linenumber is NOT unique per order
      -- in the synthetic data, so the qty tiebreak (same as the struct
      -- sort on the Spark side) is required for a deterministic array
      SELECT l_orderkey,
             list(CAST(l_quantity AS INT) ORDER BY l_linenumber, CAST(l_quantity AS INT)) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey, qtys,
           CAST(len(list_filter(qtys, x -> x >= 30)) AS BIGINT) AS n_big,
           CAST(list_sum(qtys) AS BIGINT) AS qty_sum,
           qtys[1:3] AS first3
    FROM a
    """,
)
def q_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over collected order lines: a
    deterministic collect (sorted by linenumber via struct array_sort —
    collect_list order is not guaranteed), then filter/aggregate/slice
    lambdas, all inside codegen. The collect is the one shuffle (by
    orderkey); every lambda is map-side."""
    li = _t(spark, sf_dir, "lineitem")
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("l_linenumber").alias("ln"),
                                F.col("l_quantity").cast("int").alias("qty")))
    )
    g = li.groupBy("l_orderkey").agg(
        F.transform(arr, lambda x: x.qty).alias("qtys")
    )
    return g.select(
        "l_orderkey",
        "qtys",
        F.size(F.filter("qtys", lambda x: x >= 30)).cast("long").alias("n_big"),
        F.aggregate("qtys", F.lit(0).cast("long"), lambda a, x: a + x).alias("qty_sum"),
        F.slice("qtys", 1, 3).alias("first3"),
    )


@_register(
    "window_time_range",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS rolling_cnt,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS rolling_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user rolling 1-hour event count and
    value sum. The frame is defined on physical microseconds (identical
    integers in both engines — no timezone games), sums in exact decimal
    so the sliding accumulation order can't perturb the double. One
    shuffle on user_id; the frame scan is sorted within partitions."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1000000, 0)
    )
    return ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).alias("rolling_cnt"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 2)
         .cast("double").alias("rolling_sum"),
    )


@_register(
    "cube_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all four combinations of returnflag ×
    linestatus margins) — one pass, Expand + single hash aggregate, the
    grouping-sets companion to rollup_revenue."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "profile_columns",
    oracle="""
    SELECT 'c_custkey' AS col_name, count(*) - count(c_custkey) AS n_nulls, count(DISTINCT c_custkey) AS n_distinct FROM customer
    UNION ALL
    SELECT 'c_name', count(*) - count(c_name), count(DISTINCT c_name) FROM customer
    UNION ALL
    SELECT 'c_nationkey', count(*) - count(c_nationkey), count(DISTINCT c_nationkey) FROM customer
    UNION ALL
    SELECT 'c_acctbal', count(*) - count(c_acctbal), count(DISTINCT c_acctbal) FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*) - count(c_mktsegment), count(DISTINCT c_mktsegment) FROM customer
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profile: per-column null count + exact distinct
    count in ONE table pass (multi-distinct → Expand + two-level agg),
    unpivoted via stack. At 100 TB swap the exact distincts for
    approx_count_distinct — the plan shape (single pass, no join of five
    scans like the naive SQL) is the point."""
    c = _t(spark, sf_dir, "customer")
    aggs = []
    for col in c.columns:
        aggs.append((F.count(F.lit(1)) - F.count(col)).alias(f"n_{col}"))
        aggs.append(F.countDistinct(col).alias(f"d_{col}"))
    row = c.agg(*aggs)
    stack_args = ", ".join(f"'{col}', n_{col}, d_{col}" for col in c.columns)
    return row.select(
        F.expr(
            f"stack({len(c.columns)}, {stack_args}) AS (col_name, n_nulls, n_distinct)"
        )
    )


@_register(
    "fuzzy_brand_match",
    oracle="""
    WITH b AS (SELECT DISTINCT p_brand FROM part)
    SELECT a.p_brand AS brand_a, c.p_brand AS brand_b,
           CAST(levenshtein(a.p_brand, c.p_brand) AS BIGINT) AS dist
    FROM b a JOIN b c
      ON a.p_brand < c.p_brand AND levenshtein(a.p_brand, c.p_brand) <= 1
    """,
)
def q_fuzzy_brand_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching on a dimension: edit-distance ≤ 1 pairs over
    distinct brands (the SURVEY's gene-symbol/alias fuzzy-matching shape).
    The distinct-values side is dimension-sized → broadcast nested-loop;
    at corpus scale the same op runs per-blocking-key (first char /
    length band) to bound the quadratic term."""
    b = _t(spark, sf_dir, "part").select("p_brand").distinct()
    a = b.select(F.col("p_brand").alias("brand_a"))
    c2 = b.select(F.col("p_brand").alias("brand_b"))
    dist = F.levenshtein("brand_a", "brand_b")
    return (
        a.join(c2, (F.col("brand_a") < F.col("brand_b")) & (dist <= 1))
        .select("brand_a", "brand_b", dist.cast("long").alias("dist"))
    )


# ---------------------------------------------------------------------------
# Time-series extensions: LOCF resampling, SCD2 intervals
# ---------------------------------------------------------------------------

@_register(
    "resample_locf_hourly",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS us, value, event_id
      FROM events WHERE user_id < 8
    ),
    obs AS (
      SELECT user_id, us, arg_max(value, event_id) AS val
      FROM ev GROUP BY user_id, us
    ),
    b AS (
      SELECT min(us) - min(us) % 3600000000 AS t0, max(us) AS t1 FROM ev
    ),
    grid AS (
      SELECT u.user_id, g.us
      FROM (SELECT DISTINCT user_id FROM ev) u
      CROSS JOIN (SELECT unnest(generate_series(t0, t1, 3600000000)) AS us
                  FROM b) g
    ),
    unioned AS (
      SELECT user_id, us, val, 0 AS is_grid FROM obs
      UNION ALL
      SELECT user_id, us, NULL, 1 FROM grid
    ),
    filled AS (
      SELECT user_id, us, is_grid,
             last_value(val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, is_grid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
      FROM unioned
    )
    SELECT user_id, us AS grid_us, value_locf
    FROM filled WHERE is_grid = 1
    """,
)
def q_resample_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with last-observation-carried-forward
    (operators/timeseries.resample_locf): per-user hourly grid between
    the global bounds, each grid point carrying the latest at-or-before
    observation (ties broken by greatest event_id). Works entirely in
    epoch micros — identical integers in both engines. One shuffle on
    user_id; the grid is exploded executor-side from a 1-row broadcast
    bounds frame, never a driver loop."""
    from gene_level_metadata_pipeline_spark.operators.timeseries import resample_locf

    ev = (
        _events(spark, sf_dir)
        .where(F.col("user_id") < 8)
        .select("user_id", F.unix_micros("ts").alias("us"), "value", "event_id")
    )
    out = resample_locf(
        ev, "user_id", "us", "value", "event_id",
        step_us=3600 * 1000000,
    )
    return out.select(
        "user_id", F.col("grid_ts").alias("grid_us"), "value_locf"
    )


@_register(
    "scd2_intervals",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
    ),
    ordered AS (
      SELECT user_id, event_type, us, event_id,
             row_number() OVER w AS rn,
             lag(event_type) OVER w AS prev
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, us, event_id
      FROM ordered WHERE rn = 1 OR event_type IS DISTINCT FROM prev
    )
    SELECT user_id, event_type,
           us AS valid_from,
           lead(us) OVER w2 AS valid_to,
           (lead(us) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension-history build (operators/timeseries.scd2_intervals):
    collapse each user's event-type stream into validity intervals
    [valid_from, valid_to) with a current-row flag. Change detection
    (lag) and interval close (lead) share ONE user_id shuffle; the
    unique event_id tie-break makes same-timestamp orderings
    reproducible."""
    from gene_level_metadata_pipeline_spark.operators.timeseries import scd2_intervals

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    return scd2_intervals(ev, "user_id", "us", "event_type", "event_id")


# ---------------------------------------------------------------------------
# Data-quality validation / profiling extensions
# ---------------------------------------------------------------------------

@_register(
    "validate_constraints",
    oracle="""
    SELECT 'o_custkey_not_null' AS rule,
           count(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'o_status_domain',
           count(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O','F','P') THEN 1 END)
    FROM orders
    UNION ALL
    SELECT 'l_discount_low',
           count(CASE WHEN l_discount IS NOT NULL
                       AND l_discount NOT BETWEEN 0.0 AND 0.05 THEN 1 END)
    FROM lineitem
    UNION ALL
    SELECT 'l_qty_range',
           count(CASE WHEN l_quantity IS NOT NULL
                       AND l_quantity NOT BETWEEN 1 AND 50 THEN 1 END)
    FROM lineitem
    UNION ALL
    SELECT 'o_orderkey_unique', CAST(COALESCE(sum(n), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey
          HAVING count(*) > 1)
    UNION ALL
    SELECT 'l_orderkey_unique', CAST(COALESCE(sum(n), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey
          HAVING count(*) > 1)
    UNION ALL
    SELECT 'li_fk_orders', count(*)
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
    UNION ALL
    SELECT 'ord_fk_customer', count(*)
    FROM orders d
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON d.o_custkey = c.c_custkey
    WHERE d.o_custkey IS NOT NULL AND c.c_custkey IS NULL
    """,
)
def q_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (operators/quality.validate): the
    reference's hand-rolled dup audits and expected-count comments
    (TM:30-32,46,74; T:213-216,273) as first-class rules. Predicate
    rules fuse into one conditional-count pass per table (2 scans for 4
    rules here); unique rules are groupBy counts; FK rules are anti
    joins against broadcast-distinct parent keys."""
    from gene_level_metadata_pipeline_spark.operators import quality as Q

    ord_ = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    return Q.validate([
        Q.not_null("o_custkey_not_null", ord_, "o_custkey"),
        Q.accepted_values("o_status_domain", ord_, "o_orderstatus",
                          ["O", "F", "P"]),
        Q.in_range("l_discount_low", li, "l_discount", 0.0, 0.05),
        Q.in_range("l_qty_range", li, "l_quantity", 1, 50),
        Q.unique("o_orderkey_unique", ord_, "o_orderkey"),
        Q.unique("l_orderkey_unique", li, "l_orderkey"),
        Q.foreign_key("li_fk_orders", li, "l_orderkey", ord_, "o_orderkey"),
        Q.foreign_key("ord_fk_customer", ord_, "o_custkey", cust, "c_custkey"),
    ])


@_register(
    "histogram_prices",
    oracle="""
    WITH b AS (
      SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo0,
             CAST(max(o_totalprice) AS DOUBLE) AS hi0
      FROM orders
    ),
    binned AS (
      SELECT least(19, CAST(floor((CAST(o_totalprice AS DOUBLE) - lo0)
                                  / ((hi0 - lo0) / 20.0)) AS BIGINT)) AS bin,
             lo0, (hi0 - lo0) / 20.0 AS w
      FROM orders, b
    )
    SELECT bin, lo0 + bin * w AS lo, lo0 + (bin + 1) * w AS hi,
           count(*) AS n
    FROM binned GROUP BY bin, lo0, w
    """,
)
def q_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (operators/quality.histogram): 20 bins over
    order totals. A 1-row min/max aggregate broadcast into the binning
    scan — two passes, no driver collect; bin arithmetic is raw IEEE
    double ops so the oracle bit-matches."""
    from gene_level_metadata_pipeline_spark.operators.quality import histogram

    return histogram(_t(spark, sf_dir, "orders"), "o_totalprice", 20)


@_register(
    "set_operations",
    oracle="""
    WITH small AS (SELECT DISTINCT p_brand FROM part WHERE p_size < 15),
         smc AS (SELECT DISTINCT p_brand FROM part
                 WHERE p_type IN ('SMALL', 'MEDIUM'))
    SELECT 'brand_both' AS op, p_brand AS val
    FROM (SELECT p_brand FROM small INTERSECT SELECT p_brand FROM smc)
    UNION ALL
    SELECT 'brand_only_small', p_brand
    FROM (SELECT p_brand FROM small EXCEPT SELECT p_brand FROM smc)
    UNION ALL
    SELECT 'nation_multiset', CAST(nk AS VARCHAR)
    FROM (SELECT c_nationkey AS nk FROM customer
          INTERSECT ALL
          SELECT s_nationkey AS nk FROM supplier)
    """,
)
def q_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators the reference lacks entirely (SURVEY §2.6 'absent
    set ops'): INTERSECT / EXCEPT on distinct dimension slices and
    INTERSECT ALL multiset semantics (per-key multiplicity =
    min(count_left, count_right)). All three arms are dimension-sized →
    hash-partitioned set ops with AQE-coalesced outputs."""
    part = _t(spark, sf_dir, "part")
    small = part.where(F.col("p_size") < 15).select("p_brand").distinct()
    smc = part.where(F.col("p_type").isin("SMALL", "MEDIUM")).select("p_brand").distinct()
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    tag = lambda df, name, col: df.select(
        F.lit(name).alias("op"), F.col(col).cast("string").alias("val")
    )
    return (
        tag(small.intersect(smc), "brand_both", "p_brand")
        .unionByName(tag(small.subtract(smc), "brand_only_small", "p_brand"))
        .unionByName(tag(cn.intersectAll(sn), "nation_multiset", "nk"))
    )


@_register("approx_profile")
def q_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches next to their exact twins: per event type,
    HyperLogLog++ distinct users (approx_count_distinct, mergeable
    partial sketches — the 100 TB path) and an approximate median via
    percentile_approx, plus exact countDistinct for in-row error
    audit. Rows-only by design: sketch outputs are
    implementation-defined, so no cross-engine oracle exists; the unit
    test asserts the HLL estimate lands within rsd bounds of the exact
    count."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "curation_pipeline",
    oracle="""
    WITH q AS (
      SELECT doc_id, text, source,
             len(string_split(text, ' ')) AS n_words,
             length(replace(text, ' ', '')) AS nospace
      FROM documents
    ),
    ok AS (
      SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM q
      WHERE n_words >= 5 AND n_words <= 100000 AND nospace / n_words < 12.0
    ),
    raw AS (SELECT source, count(*) AS n_raw FROM documents GROUP BY source),
    k AS (
      SELECT source, count(*) AS n_ok,
             count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
             CAST(COALESCE(sum(CASE WHEN rn = 1 THEN n_words END), 0)
                  AS BIGINT) AS ws_tokens_kept
      FROM ok GROUP BY source
    )
    SELECT r.source,
           r.n_raw,
           COALESCE(k.n_ok, 0) AS n_ok,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.ws_tokens_kept, 0) AS ws_tokens_kept
    FROM raw r LEFT JOIN k ON r.source = k.source
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-curation composite — the training-data shape:
    quality gate (word count + word-shape heuristics, textanalysis
    formulas) → global exact dedup (first doc_id per identical text
    wins) → per-source audit counts (raw / passed / kept / kept
    tokens). Plan: one documents scan feeds both the raw counts and the
    gated branch; dedup is a window over the text key (at 100 TB,
    partition by md5(text) to keep shuffle keys short); final join of
    two source-grained aggregates is broadcast-sized."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    nospace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    gated = docs.select(
        "doc_id", "text", "source", n_words.alias("n_words"),
        nospace.alias("nospace"),
    ).where(
        (F.col("n_words") >= 5) & (F.col("n_words") <= 100000)
        & (F.col("nospace") / F.col("n_words") < 12.0)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("text").orderBy("doc_id")
    ranked = gated.withColumn("rn", F.row_number().over(w))
    kept = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_ok"),
        F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("rn") == 1, F.col("n_words"))), F.lit(0)
        ).cast("long").alias("ws_tokens_kept"),
    )
    raw = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    return raw.join(kept, "source", "left").select(
        "source", "n_raw",
        F.coalesce("n_ok", F.lit(0)).alias("n_ok"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("ws_tokens_kept", F.lit(0)).alias("ws_tokens_kept"),
    )


# ---------------------------------------------------------------------------
# Semi-structured JSON + schema evolution
# ---------------------------------------------------------------------------

@_register(
    "json_props_extract",
    oracle="""
    WITH p AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           count(DISTINCT k) AS n_distinct_k,
           max(k) AS max_k
    FROM p GROUP BY event_type
    """,
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column handling (the reference's S11 flatten
    family, applied to an embedded JSON string column): typed parse via
    ``from_json`` with an explicit schema — schema-on-read stays
    columnar, the parse happens once in codegen, and downstream
    aggregation is plain relational. A ``get_json_object`` cross-check
    guards parse agreement (mismatch rows would surface as NULL k).
    At scale prefer from_json + explicit schema over repeated
    get_json_object calls: one parse per row vs one per extraction."""
    ev = _events(spark, sf_dir)
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k BIGINT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.countDistinct("k").alias("n_distinct_k"),
        F.max("k").alias("max_k"),
    )


@_register(
    "union_evolve_schemas",
    oracle="""
    SELECT o_orderkey, o_orderpriority, CAST(NULL AS DOUBLE) AS total
    FROM orders WHERE o_orderdate < TIMESTAMP '1994-01-01'
    UNION ALL
    SELECT o_orderkey, NULL, o_totalprice
    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
)
def q_union_evolve_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union (reshape.union_evolve): dplyr bind_rows
    semantics — frames with different column sets concatenated by name,
    missing columns NULL-filled, first-seen column order. The map-side
    concatenation adds no shuffle; each branch's filter still pushes to
    its scan."""
    from gene_level_metadata_pipeline_spark.operators.reshape import union_evolve

    ord_ = _t(spark, sf_dir, "orders")
    old = ord_.where(
        F.col("o_orderdate") < F.lit("1994-01-01").cast("timestamp")
    ).select("o_orderkey", "o_orderpriority")
    new = ord_.where(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    ).select("o_orderkey", F.col("o_totalprice").alias("total"))
    return union_evolve(old, new)


# ---------------------------------------------------------------------------
# LLM-corpus ops: token-window chunking, vocabulary top-k
# ---------------------------------------------------------------------------

@_register(
    "chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0, greatest(n - 1, 0), 40)) AS start
      FROM t
    )
    SELECT doc_id,
           start // 40 AS chunk_idx,
           CAST(least(start + 50, n) - start AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[start + 1 : least(start + 50, n)], ' ')
             AS chunk_text
    FROM s
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (textanalysis.chunk_documents): 50-token
    windows every 40 tokens (10-token overlap) over every document —
    sequence → explode → slice, all codegen, zero shuffles."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        chunk_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, "text", "doc_id", size=50, stride=40)


@_register(
    "vocab_top_words",
    oracle="""
    WITH wc AS (
      SELECT w AS word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
      GROUP BY w
    ),
    ranked AS (
      SELECT word, n,
             CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT)
               AS rank
      FROM wc
    )
    SELECT word, n, rank FROM ranked WHERE rank <= 50
    """,
)
def q_vocab_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: exact top-50 words by frequency with a total
    deterministic order (count desc, word asc — ties at the boundary
    cannot flap). explode → hash agg (map-side partial) → TakeOrdered
    top-k, never a global sort; the rank is stamped after the k-row
    result is already bounded."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = wc.orderBy(F.col("n").desc(), F.col("word")).limit(50)
    w = Window.orderBy(F.col("n").desc(), F.col("word"))
    return top.select(
        "word", "n", F.row_number().over(w).cast("long").alias("rank")
    )


# ---------------------------------------------------------------------------
# Sliding / session windows + snapshot CDC
# ---------------------------------------------------------------------------

@_register(
    "events_sliding_windows",
    oracle="""
    WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
    x AS (
      SELECT us, value,
             (us // 900000000) * 900000000 - k * 900000000 AS ws
      FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
    )
    SELECT ws AS ws_us, ws + 3600000000 AS we_us,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total
    FROM x GROUP BY ws
    """,
)
def q_events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 1-hour windows advancing every 15
    minutes — each event lands in exactly 4 windows (Spark's ``window``
    with a slide replicates map-side, then one hash aggregate; the
    oracle reproduces the replication with an explicit 0..3 cross
    join). Epoch-aligned starts, micros arithmetic, decimal sums."""
    ev = _events(spark, sf_dir)
    w = F.window("ts", "1 hour", "15 minutes")
    return ev.groupBy(w.alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value"), 2).alias("total"),
    ).select(
        F.unix_micros("w.start").alias("ws_us"),
        F.unix_micros("w.end").alias("we_us"),
        "n",
        "total",
    )


@_register(
    "events_session_windows",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
    o AS (
      SELECT user_id, us, value,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ),
    g AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           min(us) AS session_start_us,
           max(us) + 1800000000 AS session_end_us,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total
    FROM g GROUP BY user_id, sid
    """,
)
def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session windows (``F.session_window``, 30-minute gap):
    merges events whose inter-arrival gap is under the timeout; the
    window end is last-event + gap (end-exclusive, so a gap of exactly
    30 min starts a new session). The oracle derives identical sessions
    via lag-based island detection — the same semantics the batch
    ``sessionize`` operator certifies, now through Spark's native
    session-window aggregation (one shuffle on user_id + merging agg)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value"), 2).alias("total"),
    ).select(
        "user_id",
        F.unix_micros("sw.start").alias("session_start_us"),
        F.unix_micros("sw.end").alias("session_end_us"),
        "n",
        "total",
    )


@_register(
    "snapshot_diff_orders",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN round(o_totalprice * 1.1, 2) ELSE o_totalprice
             END AS o_totalprice,
             o_orderstatus
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_orderstatus <> 'P'
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                THEN 'update' END AS change
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE (o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
    """,
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-over-release CDC (operators/cdc.snapshot_diff): diff two
    pinned snapshots of orders — the 1997 release vs the 1998 release
    with urgent orders repriced and 'P'-status orders dropped —
    classifying every key as insert / delete / update (unchanged keys
    filtered). One full-outer shuffle join on the key; the reference's
    dated-release model (I:16,19) gains a first-class 'what changed'
    operator."""
    from gene_level_metadata_pipeline_spark.operators.cdc import snapshot_diff

    ord_ = _t(spark, sf_dir, "orders")
    old = ord_.where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")
    new = (
        ord_.where(
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderstatus") != "P")
        )
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderpriority") == "1-URGENT",
                _round_to(F.col("o_totalprice") * 1.1, 2),
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
            "o_orderstatus",
        )
    )
    return snapshot_diff(old, new, "o_orderkey")


@_register(
    "graph_triangles",
    oracle="""
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    pairs AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS n
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY a.l_suppkey, b.l_suppkey
    ),
    edges AS (SELECT u, v FROM pairs WHERE n >= 3)
    SELECT (SELECT count(*) FROM edges) AS n_edges,
           (SELECT count(*)
            FROM edges e1
            JOIN edges e2 ON e1.v = e2.u
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational graph analytics beyond component labeling: build a
    supplier co-occurrence graph (suppliers sharing ≥3 orders; edges
    stored once with u < v) and count triangles with the classic
    two-join enumeration — each triangle counted exactly once because
    every edge is oriented low→high. The per-order self-join is bounded
    by order fan-out (≈4 suppliers/order ⇒ ≤6 pairs); the triangle join
    runs on the sparsified edge set. At 100 TB the standard mitigation
    is degree-ordered orientation (orient edges from lower-degree to
    higher-degree node) which bounds the join fan-out by sqrt(m)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("v"))
    edges = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 3)
        .select("u", "v")
    )
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return edges.agg(F.count(F.lit(1)).alias("n_edges")).join(tri)


@_register(
    "kmeans_assign",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
    scored AS (
      SELECT v.vec_id, c.cid,
             round({_COS.format(a='v.e', b='c.ce')}, 4) AS sim
      FROM v CROSS JOIN c
    ),
    assign AS (
      SELECT vec_id, cid, sim FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cid
        ) AS rn FROM scored
      ) WHERE rn = 1
    )
    SELECT cid AS cluster_id, count(*) AS n,
           round(CAST(sum(CAST(sim AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 4) AS avg_sim
    FROM assign GROUP BY cid
    """,
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's-algorithm assignment step — the iterative-ML shape:
    8 seed centroids (vec_id < 8) broadcast against every embedding,
    JVM-side cosine (zip_with/aggregate fold — no Python), argmax via
    max_by over a (sim, -cid) struct so ties go to the lowest centroid
    deterministically, then per-cluster size and mean similarity. The
    full k-means loop is this plan iterated with re-derived centroids;
    each iteration is one broadcast join + one aggregate — no shuffle
    of the embedding table itself."""
    from gene_level_metadata_pipeline_spark.operators.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    scored = emb.join(F.broadcast(cent)).select(
        "vec_id", "cid",
        F.round(cosine(F.col("embedding"), F.col("ce")), 4).alias("sim"),
    )
    assign = scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct("cid", "sim"), F.struct(F.col("sim"), -F.col("cid"))
        ).alias("a")
    )
    return assign.groupBy(F.col("a.cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n"),
        _davg(F.col("a.sim"), 4).alias("avg_sim"),
    )


@_register(
    "read_xml_rows",
    oracle="""
    SELECT * FROM (VALUES
      ('g1', CAST(1.5 AS DOUBLE), 'a'),
      ('g2', CAST(2.5 AS DOUBLE), NULL)
    ) AS t(symbol, score, tag)
    """,
)
def q_read_xml_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scan (sources/readers.read_xml, Spark 4 native XML source):
    row-tag extraction with inferred schema; a missing child element
    becomes NULL (same padding contract as the delimited readers)."""
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_xml

    df = read_xml(spark, f"{fixture_dir()}/annotations.xml", "gene")
    return df.select("symbol", F.col("score").cast("double"), "tag")


@_register(
    "posexplode_tokens",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS word
    FROM (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 20
    ), unnest(generate_series(1, len(toks))) AS g(i)
    """,
)
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (posexplode): token stream with positions — the
    WITH ORDINALITY form of R1's separate_rows, needed whenever token
    order carries meaning (n-gram reconstruction, positional vocab).
    Map-side only, zero shuffles."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    ).withColumn("pos", F.col("pos").cast("long"))


@_register(
    "substring_dup_spans",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0, greatest(n - 1, 0), 20)) AS start
      FROM t
    ),
    c AS (
      SELECT doc_id,
             md5(array_to_string(toks[start + 1 : least(start + 20, n)], ' '))
               AS chunk_hash
      FROM s WHERE least(start + 20, n) - start = 20
    )
    SELECT chunk_hash,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occ
    FROM c GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
    """,
)
def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage detection — the boilerplate/
    quotation dedup shape: non-overlapping 20-token chunks (partial tail
    chunks excluded), md5 chunk fingerprints, passages appearing in ≥2
    distinct documents reported with document and occurrence counts.
    Chunking is map-side (chunk_documents machinery); the single shuffle
    is the 16-byte-hash groupBy — payload text never shuffles. The
    span-level complement to document-level MinHash dedup; at 100 TB this
    is the scalable stand-in for suffix-array substring dedup."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        chunk_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "text", "doc_id", size=20, stride=20)
    return (
        chunks.where(F.col("n_chunk_tokens") == 20)
        .select("doc_id", F.md5("chunk_text").alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .where(F.col("n_docs") >= 2)
    )


@_register(
    "delta_agg_merge",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_spend
    FROM orders GROUP BY o_custkey
    """,
)
def q_delta_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a pre-1997 base aggregate
    merged with a 1997+ delta aggregate via partial-aggregate combine
    (counts add; DECIMAL sums add associatively — the reason sums stay
    decimal until the final round). The merged result provably equals
    the full-scan aggregate (the oracle IS the full scan) — certifying
    the merge identity a 100 TB rollup relies on to avoid rescans; the
    same shape maintains the base against daily deltas forever."""
    ord_ = _t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp")

    def part(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("t"),
        )

    base = part(ord_.where(F.col("o_orderdate") < cut))
    delta = part(ord_.where(F.col("o_orderdate") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(F.sum("n_orders").alias("n_orders"), F.sum("t").alias("t"))
        .select(
            "o_custkey",
            "n_orders",
            F.round("t", 2).cast("double").alias("total_spend"),
        )
    )


@_register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           count(*) AS n_rows,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (each single margin + grand total — a
    shape neither ROLLUP nor CUBE produces) with grouping_id
    disambiguating real NULLs from subtotal NULLs. One Expand + one
    hash aggregate, same single-pass plan family as rollup_revenue /
    cube_revenue."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag", "l_linestatus",
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_rows"),
        _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
    )


@_register(
    "train_split_counts",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             CASE
               WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                    < 'cccccccc' THEN 'train'
               WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                    < 'e6666666' THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT lang, split, count(*) AS n FROM s GROUP BY lang, split
    """,
)
def q_train_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (textanalysis.train_split,
    80/10/10): membership is a pure function of md5(salt, key) so any
    engine reproduces the identical assignment — the oracle re-derives
    the same bins from the same hex bounds (0.8·16^8 = 0xcccccccc).
    Split assignment is map-side; the only shuffle is the audit count."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import train_split

    docs = _t(spark, sf_dir, "documents")
    return (
        train_split(docs, "doc_id")
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "normalize_text_docs",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
                  regexp_replace(lower(text), '[\\x00-\\x1f\\x7f]', ' ', 'g'),
                  '\\s+', ' ', 'g')) AS text_norm,
           length(trim(regexp_replace(
                  regexp_replace(lower(text), '[\\x00-\\x1f\\x7f]', ' ', 'g'),
                  '\\s+', ' ', 'g'))) AS n_chars_norm
    FROM documents WHERE doc_id < 100
    """,
)
def q_normalize_text_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenization text normalization (textanalysis.normalize_text):
    lowercase → control-char strip → whitespace collapse → trim, all
    inside codegen (Java regex; the oracle uses the identical pattern
    with DuckDB's global flag)."""
    from gene_level_metadata_pipeline_spark.operators.textanalysis import (
        normalize_text,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    out = normalize_text(docs, "text", "text_norm")
    return out.select(
        "doc_id", "text_norm",
        F.length("text_norm").cast("long").alias("n_chars_norm"),
    )


@_register(
    "encode_documents",
    oracle="""
    WITH wc AS (
      SELECT w AS word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    ),
    v AS (
      SELECT word, id FROM (
        SELECT word, CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT)
               AS id
        FROM wc
      ) WHERE id <= 30
    ),
    t AS (
      SELECT doc_id, toks[i] AS word, i
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           unnest(generate_series(1, len(toks))) AS g(i)
    )
    SELECT doc_id,
           list(COALESCE(v.id, -1) ORDER BY i) AS token_ids,
           CAST(count(CASE WHEN v.id IS NULL THEN 1 END) AS BIGINT) AS n_unk
    FROM t LEFT JOIN v USING (word)
    GROUP BY doc_id
    """,
)
def q_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-to-ids — the final text→model-input step: a frequency-
    ranked vocabulary (top 30 words here; top 50k in production) built
    with the vocab_top_words machinery, broadcast-joined onto the
    position-exploded token stream, re-assembled into an ordered id
    array per document with out-of-vocabulary words mapped to -1.
    Shuffles: vocab agg + the doc_id re-assembly; the vocab join itself
    is broadcast (vocabularies are dimension-sized even at 100 TB)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("word"))
    vocab = (
        wc.select("word", F.row_number().over(w).cast("long").alias("id"))
        .where(F.col("id") <= 30)
    )
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    enc = toks.join(F.broadcast(vocab), "word", "left")
    return enc.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos").alias("p"),
                        F.coalesce("id", F.lit(-1)).alias("i"),
                    )
                )
            ),
            lambda s: s.i,
        ).alias("token_ids"),
        F.count(F.when(F.col("id").isNull(), 1)).alias("n_unk"),
    )


@_register(
    "harmonize_multi_source",
    oracle="""
    WITH spn AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IS NOT NULL
    ),
    src_orders AS (
      SELECT o_custkey AS c_custkey, count(*) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                  AS DOUBLE) AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    src_urgent AS (
      SELECT o_custkey AS c_custkey, count(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    ),
    src_nation AS (
      SELECT c_custkey, n_name AS nation_name
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    src_seg AS (SELECT c_custkey, c_mktsegment FROM customer)
    SELECT DISTINCT spn.c_custkey, o.n_orders, o.total_spend,
           u.n_urgent, nt.nation_name, s.c_mktsegment
    FROM spn
    LEFT JOIN src_orders o USING (c_custkey)
    LEFT JOIN src_urgent u USING (c_custkey)
    LEFT JOIN src_nation nt USING (c_custkey)
    LEFT JOIN src_seg s USING (c_custkey)
    """,
)
def q_harmonize_multi_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's end state (EP2, SURVEY §3): ~25 per-source
    annotation tables all left-joined onto one spine — here four
    heterogeneous sources (an aggregate, a filtered aggregate, a
    dimension decoration, a plain attribute) folded onto the customer
    spine with repeated harmonize calls. Every source is key-collapsed
    before its join, so each fold is a broadcast join against the
    growing spine table — the wide-table build stays shuffle-bounded by
    the source aggregations, exactly how the 20k-gene × 25-source
    annotation matrix assembles at any corpus scale."""
    from functools import reduce

    from gene_level_metadata_pipeline_spark.operators.harmonize import (
        harmonize, spine,
    )

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    ord_ = _t(spark, sf_dir, "orders")
    spn = spine(cust, "c_custkey")
    sources = [
        ord_.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), 2).alias("total_spend"),
        ),
        ord_.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_urgent")),
        cust.join(
            F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
        ).select("c_custkey", F.col("n_name").alias("nation_name")),
        cust.select("c_custkey", "c_mktsegment"),
    ]
    return reduce(lambda acc, src: harmonize(acc, src, "c_custkey"), sources, spn)


@_register(
    "pivot_multi_values",
    oracle="""
    SELECT o_orderstatus,
           count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
             AS urgent_n,
           CAST(round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                               THEN CAST(o_totalprice AS DECIMAL(18,6))
                          END), 2) AS DOUBLE) AS urgent_total,
           count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low_n,
           CAST(round(sum(CASE WHEN o_orderpriority = '5-LOW'
                               THEN CAST(o_totalprice AS DECIMAL(18,6))
                          END), 2) AS DOUBLE) AS low_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot_multi_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2's general form — pivot_wider(values_from = c(v1, v2)): one
    pivot producing TWO value columns per pivoted key (count and sum
    here). Explicit pivot values keep Spark from running a distinct
    pre-scan; the whole thing is a single hash aggregate with
    conditional partials — identical to the oracle's CASE form."""
    ord_ = _t(spark, sf_dir, "orders")
    out = (
        ord_.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("o_totalprice"), 2).alias("total"),
        )
    )
    return out.select(
        "o_orderstatus",
        F.col("1-URGENT_n").alias("urgent_n"),
        F.col("1-URGENT_total").alias("urgent_total"),
        F.col("5-LOW_n").alias("low_n"),
        F.col("5-LOW_total").alias("low_total"),
    )


@_register(
    "packed_kv_parse",
    oracle="""
    WITH pairs AS (
      SELECT p_partkey,
             unnest(string_split(
               'size=' || CAST(p_size AS VARCHAR) || ';brand=' || p_brand
               || ';type=' || p_type, ';')) AS kv
      FROM part WHERE p_partkey < 200
    )
    SELECT p_partkey,
           split_part(kv, '=', 1) AS attr_key,
           split_part(kv, '=', 2) AS attr_val
    FROM pairs
    """,
)
def q_packed_kv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed key=value attribute strings → long (key, value) rows via
    str_to_map + map explode — the reference's pipe-packed multi-value
    idiom (R1) generalized to keyed packing. The packed string is built
    from part attributes so the oracle derives the identical input; the
    parse is map-side (str_to_map + explode, no Python, no shuffle)."""
    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    packed = F.concat(
        F.lit("size="), F.col("p_size").cast("string"),
        F.lit(";brand="), F.col("p_brand"),
        F.lit(";type="), F.col("p_type"),
    )
    return part.select(
        "p_partkey",
        F.explode(F.str_to_map(packed, F.lit(";"), F.lit("="))).alias(
            "attr_key", "attr_val"
        ),
    )


@_register(
    "window_value_suite",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_ok,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_ok,
           round(percent_rank() OVER w, 6) AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def q_window_value_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-window completion of window_rank_suite: first/last/nth value
    over full-partition frames plus percent_rank — all four functions
    share ONE custkey sort exchange (unique orderkey ordering keeps
    every result deterministic)."""
    from pyspark.sql import Window

    ord_ = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ord_.select(
        "o_custkey", "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wfull).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_ok"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@_register(
    "bool_agg_flags",
    oracle="""
    SELECT l_orderkey,
           bool_or(l_returnflag = 'R') AS any_returned,
           bool_and(l_quantity < 45) AS all_small,
           CAST(max_by(l_partkey, l_linenumber * 100000000 + l_partkey)
                AS BIGINT) AS last_part
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_bool_agg_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean / argmax aggregates: any/every flags per order plus the
    deterministic max_by — one hash aggregate with map-side partials.
    (l_orderkey, l_linenumber) is NOT unique in this data, so the argmax
    ordering composites the partkey in as a scalar tie-break (struct
    orderings aren't portable to the oracle engine)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.bool_or(F.col("l_returnflag") == "R").alias("any_returned"),
        F.bool_and(F.col("l_quantity") < 45).alias("all_small"),
        F.max_by(
            "l_partkey",
            F.col("l_linenumber").cast("long") * 100000000 + F.col("l_partkey"),
        ).alias("last_part"),
    )


@_register(
    "array_set_ops",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, list_sort(list(DISTINCT l_linenumber)) AS lns
      FROM lineitem WHERE l_orderkey < 400 GROUP BY l_orderkey
    )
    SELECT l_orderkey, lns,
           list_sort(list_filter(lns, x -> x IN (1, 2, 3))) AS kept,
           list_sort(list_filter(lns, x -> x NOT IN (1, 2, 3))) AS extra,
           len(lns) AS n_lines
    FROM a
    """,
)
def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations against a constant set: per-order distinct
    line numbers intersected with / subtracted by {1,2,3} — results
    array_sort-ed on BOTH engines because set-op output order is
    implementation-defined (the determinism rule every array-valued
    oracle follows)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 400)
    base = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_linenumber")).alias("lns")
    )
    const = F.array(F.lit(1), F.lit(2), F.lit(3))
    return base.select(
        "l_orderkey", "lns",
        F.array_sort(F.array_intersect("lns", const)).alias("kept"),
        F.array_sort(F.array_except("lns", const)).alias("extra"),
        F.size("lns").cast("long").alias("n_lines"),
    )


@_register(
    "datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
    FROM orders WHERE o_orderkey < 600
    """,
)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar family (absent from the reference — SURVEY
    §2.10 'date/time: none' — but table stakes for an engine): year /
    month / day-of-week extraction, interval arithmetic, month end,
    day difference. DuckDB numbers dayofweek from 0=Sunday vs Spark's
    1=Sunday — the oracle shifts by one; all date math happens on the
    calendar date so session timezones cannot perturb it."""
    ord_ = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 600)
    d = F.to_date("o_orderdate")
    return ord_.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofweek(d).alias("dow"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
    )


@_register(
    "stats_profile",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))
                  AS DOUBLE) AS sqq,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS sp,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6)))
                  AS DOUBLE) AS sqp
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((sqq - sq * sq / n) / (n - 1), 4) AS var_qty,
           round((sqp - sq * sp / n) / (n - 1), 4) AS covar_qty_price
    FROM m
    """,
)
def q_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates the PORTABLE way: built-in stddev/corr
    accumulate doubles in partition order, so two engines (or two runs
    with different partitionings) disagree in the last ulp. Here the
    raw moments (Σx, Σx², Σxy) aggregate in exact DECIMAL — associative,
    order-free — and variance/covariance assemble from them in identical
    double arithmetic. One hash aggregate; same cost family as _dsum."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(18,6)")).cast("double").alias("sq"),
        F.sum((q * q).cast("decimal(28,6)")).cast("double").alias("sqq"),
        F.sum(p.cast("decimal(18,6)")).cast("double").alias("sp"),
        F.sum((q * p).cast("decimal(28,6)")).cast("double").alias("sqp"),
    )
    n = F.col("n")
    return m.select(
        "l_returnflag", "n",
        _round_to((F.col("sqq") - F.col("sq") * F.col("sq") / n) / (n - 1), 4)
            .alias("var_qty"),
        _round_to((F.col("sqp") - F.col("sq") * F.col("sp") / n) / (n - 1), 4)
            .alias("covar_qty_price"),
    )


@_register(
    "streaming_static_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment AS tier
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE c.c_custkey < 100
    """,
)
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join through an actual streaming query:
    per-micro-batch broadcast of the static dimension, no join state
    (the streaming complement of the stateful stream-stream interval
    join) — result must equal the batch join."""
    from gene_level_metadata_pipeline_spark.streaming.windows import (
        stream_static_enrich,
    )

    return stream_static_enrich(spark, sf_dir)


@_register(
    "variant_props_extract",
    oracle="""
    WITH p AS (
      SELECT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events WHERE user_id < 20
    )
    SELECT user_id, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
    FROM p GROUP BY user_id
    """,
)
def q_variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type
    (try_parse_json → try_variant_get): schema-flexible like a raw JSON
    string but stored as a typed binary encoding, so repeated path
    extraction skips re-parsing — the modern default for
    schema-on-read columns. Same relational tail as json_props_extract;
    the oracle is engine-neutral JSON extraction."""
    ev = _events(spark, sf_dir).where(F.col("user_id") < 20)
    parsed = ev.select(
        "user_id",
        F.try_variant_get(
            F.try_parse_json("props"), "$.k", "bigint"
        ).alias("k"),
    )
    return parsed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
    )


@_register(
    "custom_datasource_pages",
    oracle="""
    SELECT CAST(i // 25 AS INTEGER) AS page,
           CAST(i AS INTEGER) AS record_id,
           'G' || CAST(i AS VARCHAR) AS gene,
           CAST(i % 4 AS INTEGER) AS confidence
    FROM (SELECT unnest(generate_series(0, 99)) AS i)
    """,
)
def q_custom_datasource_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (sources/pagesource.PageSource): the
    reference's sequential REST page loop (S11, I:211-218) re-expressed
    as a Spark 4 DataSource whose pages ARE the input partitions —
    fetched on executors, one page per task. 4 pages × 25 records of
    deterministic synthetic payload; the oracle derives the identical
    rows from generate_series."""
    from gene_level_metadata_pipeline_spark.sources.pagesource import PageSource

    spark.dataSource.register(PageSource)
    return (
        spark.read.format("genepages")
        .option("pages", 4)
        .option("perpage", 25)
        .load()
    )


@_register(
    "streaming_pages_source",
    oracle="""
    SELECT CAST(i // 25 AS INTEGER) AS page,
           CAST(i AS INTEGER) AS record_id,
           'G' || CAST(i AS VARCHAR) AS gene,
           CAST(i % 4 AS INTEGER) AS confidence
    FROM (SELECT unnest(generate_series(0, 74)) AS i)
    """,
)
def q_streaming_pages_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming custom Python data source: the PageSource's stream
    reader emits ONE page per micro-batch with the page number as the
    offset (exactly-once restartable without any files). Three pages
    drain into a memory sink; the result must equal the batch rows."""
    import time
    import uuid

    from gene_level_metadata_pipeline_spark.sources.pagesource import PageSource

    spark.dataSource.register(PageSource)
    name = f"pages_sink_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("genepages")
        .option("pages", 3).option("perpage", 25).load()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    expected = 75
    try:
        for _ in range(120):
            if spark.table(name).count() >= expected:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    out = spark.table(name)
    rows = out.collect()
    df = spark.createDataFrame(rows, out.schema)
    spark.catalog.dropTempView(name)
    return df


_JACCARD_TRUTH_SQL = """
    WITH words AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, lang, array_to_string(ws[i:i+2], ' ') AS shingle
      FROM words, (SELECT unnest(generate_series(1, len(ws)-2)) AS i)
      WHERE len(ws) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.5
"""


@_register(
    "lsh_quality_metrics",
    oracle=f"""
    WITH cands AS ({_minhash_oracle()}),
    truth AS ({_JACCARD_TRUTH_SQL}),
    tp AS (
      SELECT count(*) AS n_tp
      FROM cands JOIN truth USING (doc_a, doc_b)
    )
    SELECT (SELECT count(*) FROM truth) AS n_truth,
           (SELECT count(*) FROM cands) AS n_cands,
           n_tp,
           round(n_tp * 1.0 / (SELECT count(*) FROM cands), 4) AS precision,
           round(n_tp * 1.0 / (SELECT count(*) FROM truth), 4) AS recall
    FROM tp
    """,
)
def q_lsh_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure, don't guess — the dedup stack evaluating ITSELF: MinHash
    LSH candidates (8 hashes × 4 bands) scored against exact
    language-blocked Jaccard ≥ 0.5 ground truth; one row of
    precision/recall. The exact-truth side is the expensive shingle
    join you'd never run on the full corpus — here it runs on the test
    slice to calibrate the cheap candidate generator, which is precisely
    how LSH parameters get validated before a 100 TB run (then
    lsh_params picks bands/rows for the chosen operating point)."""
    from gene_level_metadata_pipeline_spark.operators.dedup import (
        minhash_candidate_pairs,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    cands = minhash_candidate_pairs(docs, "text", "doc_id",
                                    n=3, num_hashes=8, bands=4)
    truth = ngram_jaccard_pairs(docs, "text", "doc_id",
                                n=3, threshold=0.5, block_by="lang"
                                ).select("doc_a", "doc_b")
    tp = cands.join(truth, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_tp")
    )
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_cands = cands.agg(F.count(F.lit(1)).alias("n_cands"))
    return (
        n_truth.join(n_cands).join(tp)
        .select(
            "n_truth", "n_cands", "n_tp",
            _round_to(F.col("n_tp") / F.col("n_cands"), 4).alias("precision"),
            _round_to(F.col("n_tp") / F.col("n_truth"), 4).alias("recall"),
        )
    )


@_register(
    "funnel_stages",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s1 AS (
      SELECT user_id, min(us) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.us) AS t2
      FROM ev e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.us > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.us) AS t3
      FROM ev e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.us > s2.t2
      GROUP BY e.user_id
    ),
    staged AS (
      SELECT u.user_id,
             CASE WHEN s3.t3 IS NOT NULL THEN 3
                  WHEN s2.t2 IS NOT NULL THEN 2
                  WHEN s1.t1 IS NOT NULL THEN 1
                  ELSE 0 END AS stage
      FROM (SELECT DISTINCT user_id FROM ev) u
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
    )
    SELECT stage, count(*) AS n_users FROM staged GROUP BY stage
    """,
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click-after-view →
    purchase-after-that-click): per-user event arrays folded through a
    three-state machine with ONE aggregate lambda — a single user_id
    shuffle and no self-joins, versus the oracle's three join-aggregate
    rounds (same answer, the relational formulation). The fold carries
    (stage, t1, t2) through the time-sorted events; epoch-micros keep
    both engines on identical integers."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("us"), F.col("event_type").alias("et")))
    )
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("t2"),
    )

    def step(acc, e):
        adv1 = (acc.stage == 0) & (e.et == "view")
        adv2 = (acc.stage == 1) & (e.et == "click") & (e.us > acc.t1)
        adv3 = (acc.stage == 2) & (e.et == "purchase") & (e.us > acc.t2)
        return F.struct(
            F.when(adv1, 1).when(adv2, 2).when(adv3, 3)
             .otherwise(acc.stage).alias("stage"),
            F.when(adv1, e.us).otherwise(acc.t1).alias("t1"),
            F.when(adv2, e.us).otherwise(acc.t2).alias("t2"),
        )

    staged = ev.groupBy("user_id").agg(
        F.aggregate(arr, init, step).getField("stage").alias("stage")
    )
    return staged.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Remaining TPC-H shapes (Q2/Q9/Q11/Q16/Q20). The test star schema has no
# partsupp table, so the part<->supplier relation is derived from lineitem
# and "supply cost" from l_extendedprice / l_quantity — the query SHAPES
# (correlated-min join-back, profit decomposition, global-total scalar
# subquery, distinct-count with NOT-IN, correlated-threshold semi-join)
# are preserved exactly.
# ---------------------------------------------------------------------------

@_register(
    "tpch_q2_min_cost",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT p.p_partkey, p.p_name, eu.s_name, eu.n_name, eu.s_acctbal,
             ps.unit_cost,
             row_number() OVER (
               PARTITION BY p.p_partkey
               ORDER BY ps.unit_cost, eu.s_suppkey
             ) AS rn
      FROM part p
      JOIN ps ON ps.partkey = p.p_partkey
      JOIN eu ON eu.s_suppkey = ps.suppkey
      WHERE p.p_size <= 5 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
           round(unit_cost * 100.0, 0) / 100.0 AS unit_cost
    FROM ranked WHERE rn = 1
    """,
)
def q_tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for each qualifying part,
    the EUROPE supplier with the lowest observed unit cost (correlated
    MIN + join-back, expressed as one window rank — a single l_partkey
    shuffle instead of the textbook aggregate-then-self-join). unit_cost
    is a per-row IEEE division minimized exactly (no summation), so both
    engines rank identical doubles; ties broken on s_suppkey."""
    from pyspark.sql import Window

    ps = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") <= 5) & (F.col("p_type") == "STANDARD")
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "s_suppkey")
    return (
        ps.join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
            _round_to(F.col("unit_cost"), 2).alias("unit_cost"),
        )
    )


@_register(
    "tpch_q9_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
           CAST(round(sum(CAST(
             l.l_extendedprice * (1 - l.l_discount)
             - 0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18,6))), 2)
             AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-type profit: revenue minus modeled supply
    cost (0.6 * retail price * quantity — partsupp.ps_supplycost has no
    table here), per supplier nation per ship year. part and
    supplier⋈nation are broadcast so the only scan-proportional exchange
    is the final (nation, year) aggregate; the LIKE filter prunes part
    BEFORE the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    sn = _t(spark, sf_dir, "supplier").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    profit_expr = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sn), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(_dsum(profit_expr, 2).alias("profit"))
    )


@_register(
    "tpch_q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l.l_partkey AS partkey,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,6))) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l.l_partkey
    )
    SELECT partkey, CAST(round(val, 2) AS DOUBLE) AS val
    FROM v
    WHERE CAST(val AS DOUBLE) >
          (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM v)
    """,
)
def q_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important stock: per-part value held by two
    nations' suppliers, kept only when above a fraction of the GLOBAL
    total (scalar subquery over the same aggregate). Spark recomputes a
    branched scalar subquery — measured: both the DataFrame cross-join
    form and the SQL form scan lineitem TWICE with zero exchange reuse —
    so the total is attached with a global window over the AGGREGATED
    rows instead: one fact scan, and the single-task window touches only
    dimension-grain data (bounded by |part|; for extreme dimensions swap
    in operators.selection.running_sum's two-phase machinery). Decimal
    sums make the threshold comparison order-independent."""
    sn = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").where(
                    F.col("n_name").isin("NATION_3", "NATION_7")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    v = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(sn), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,6)")
            ).alias("val")
        )
    )
    from pyspark.sql import Window

    threshold = F.sum("val").over(Window.partitionBy()).cast("double") * F.lit(0.001)
    return (
        v.withColumn("threshold", threshold)
        .where(F.col("val").cast("double") > F.col("threshold"))
        .select("partkey", F.round("val", 2).cast("double").alias("val"))
    )


@_register(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#9'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier diversity: distinct suppliers per part
    (brand, type, size) bucket, excluding flagged suppliers (negative
    balance, standing in for the 'customer complaints' NOT IN). The
    exclusion list is a broadcast anti-join; part is broadcast after its
    IN-list size filter; the exact distinct count expands map-side."""
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "tpch_q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(l_quantity AS DECIMAL(18,6))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT sh.l_suppkey
      FROM shipped sh
      JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE p.p_name LIKE '%red%' AND CAST(sh.qty AS DOUBLE) > 60.0
    )
    """,
)
def q_tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped excess-inventory suppliers: suppliers who shipped
    more than a threshold quantity of any qualifying part in 1997
    (correlated per-(supplier, part) aggregate gating a semi-join).
    Decimal quantity sums keep the >60 threshold order-independent; the
    supplier table is probed with LEFT SEMI so each supplier appears
    once regardless of how many parts qualify."""
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    qualifying = (
        shipped.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(F.col("qty").cast("double") > 60.0)
        .select("l_suppkey")
        .distinct()  # bounded by |supplier| after dedup -> broadcastable at any sf
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(qualifying),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@_register(
    "inverted_index",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    )
    SELECT word,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
           list_sort(list(DISTINCT doc_id)) AS postings
    FROM t WHERE word <> ''
    GROUP BY word
    HAVING count(DISTINCT doc_id) >= 5
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index construction — term → sorted posting list of doc
    ids, the retrieval-side dual of encode_documents. One explode + one
    word-keyed hash aggregate; document frequency falls out as the
    posting-array length (no second count pass). At 100 TB the posting
    lists for stopword-grade terms are the skew risk: shard hot terms by
    (word, doc_id bucket) and concatenate per-shard arrays on read, or
    drop terms above a df ceiling — the df floor here (>= 5) is the same
    gate in miniature."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("postings"))
        .withColumn("df", F.size("postings").cast("long"))
        .where(F.col("df") >= 5)
        .select("word", "df", "postings")
    )


# ---------------------------------------------------------------------------
# Global ordered prefix sums: token-budget selection + sequence packing
# ---------------------------------------------------------------------------

@_register(
    "token_budget_select",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_chars, n_tokens,
             sum(CAST(n_tokens AS DECIMAL(28,6)))
               OVER (ORDER BY n_chars DESC, doc_id) AS rt
      FROM d
    )
    SELECT doc_id, n_chars, n_tokens, CAST(rt AS DOUBLE) AS running_total
    FROM c WHERE rt <= 8000
    """,
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus selection under a token budget: rank documents best-first
    (n_chars desc, doc_id tiebreak = a total order) and keep rows while
    the inclusive running token count stays within budget. The running
    sum is operators.selection.running_sum — range-repartition +
    per-partition cumsum + broadcast partition offsets — NOT a global
    single-task window; the oracle's `SUM() OVER (ORDER BY ...)` is the
    same math the naive way. Exact decimal accumulation makes the
    budget comparison partitioning-independent."""
    from gene_level_metadata_pipeline_spark.operators.selection import budget_select

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).cast("long")
         .alias("n_tokens"),
    )
    picked = budget_select(
        docs, [F.col("n_chars").desc(), F.col("doc_id")], "n_tokens", 8000
    )
    return picked.select(
        "doc_id", "n_chars", "n_tokens",
        F.col("running_total").cast("double"),
    )


@_register(
    "pack_sequences",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             sum(CAST(n_tokens AS DECIMAL(28,6))) OVER (ORDER BY doc_id)
               AS rt
      FROM d
    )
    SELECT doc_id, n_tokens,
           CAST(floor((CAST(rt AS DOUBLE) - n_tokens) / 512.0) AS BIGINT)
             AS bin_id
    FROM c
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into fixed 512-token context bins by exclusive
    prefix sum (bin = floor(tokens-before-this-doc / 512)) — the
    parallel approximation of greedy first-fit packing: document order
    is preserved, each bin overflows by at most one straddling document,
    and the plan is two shuffles (range partition + 32-row offset
    window) regardless of corpus size. Token sums are integers, exact
    in both decimal and double, so floor() agrees across engines."""
    from gene_level_metadata_pipeline_spark.operators.selection import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).cast("long")
         .alias("n_tokens"),
    )
    packed = pack_sequences(docs, [F.col("doc_id")], "n_tokens", 512)
    return packed.select("doc_id", "n_tokens", "bin_id")


@_register(
    "mixture_sample_langs",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE substr(md5('mix:' || lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)
          < CASE lang
              WHEN 'de' THEN '80000000'
              WHEN 'en' THEN 'cccccccc'
              WHEN 'es' THEN '33333333'
              WHEN 'fr' THEN '4ccccccc'
              WHEN 'zh' THEN '19999999'
              ELSE '00000000'
            END
    """,
)
def q_mixture_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: each language stratum keeps its own
    fraction (en 80%, de 50%, fr 30%, es 20%, zh 10%) via the
    deterministic hash-Bernoulli predicate — the per-source reweighting
    step of assembling a training mix. No joins, no shuffles; the
    when-chain of per-stratum thresholds folds into the scan stage, and
    changing one stratum's rate cannot perturb another's selection."""
    from gene_level_metadata_pipeline_spark.operators.selection import mixture_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return mixture_sample(
        docs, "doc_id", "lang",
        {"en": 0.8, "de": 0.5, "fr": 0.3, "es": 0.2, "zh": 0.1},
    )


@_register(
    "text_bigram_lift",
    oracle="""
    WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
               AS toks
      FROM documents
    ),
    uni AS (SELECT unnest(toks) AS w FROM d),
    uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    bi AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM d, unnest(generate_series(1, len(toks) - 1)) AS g(i)
    ),
    bc AS (SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY w1, w2),
    tot AS (
      SELECT (SELECT count(*) FROM uni) AS n_uni,
             (SELECT count(*) FROM bi) AS n_bi
    )
    SELECT bc.w1, bc.w2, bc.c_ab,
           round(((((CAST(bc.c_ab AS DOUBLE) * tot.n_uni) / a.c)
                   * tot.n_uni) / b.c) / tot.n_bi, 6) AS lift
    FROM bc
    JOIN uc a ON a.w = bc.w1
    JOIN uc b ON b.w = bc.w2
    CROSS JOIN tot
    WHERE bc.c_ab >= 8
    """,
)
def q_text_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: adjacent word pairs scored by lift —
    P(w1 w2) / (P(w1) P(w2)), the exponentiated PMI. The ratio is kept
    un-logged so it stays a chain of IEEE multiplies/divides over exact
    integer counts, performed in the same order in both engines (log()
    can differ by an ulp between libm implementations). Bigrams come
    from zipping the token array with its shifted self (no per-position
    slice); unigram counts broadcast onto bigram counts; the two corpus
    totals ride along as a 1-row broadcast cross join."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("toks"),
    )
    uni = docs.select(F.explode("toks").alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    bi = docs.where(F.size("toks") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.size("toks") - 1),
                F.slice(F.col("toks"), 2, F.size("toks") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    tot = uni.agg(F.count(F.lit(1)).alias("n_uni")).join(
        bi.agg(F.count(F.lit(1)).alias("n_bi"))
    )
    a = uc.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    b = uc.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    lift = (
        F.col("c_ab").cast("double") * F.col("n_uni") / F.col("c_a")
        * F.col("n_uni") / F.col("c_b") / F.col("n_bi")
    )
    return (
        bc.where(F.col("c_ab") >= 8)
        .join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .join(F.broadcast(tot))
        .select("w1", "w2", "c_ab", _round_to(lift, 6).alias("lift"))
    )


@_register(
    "pagerank_suppliers",
    oracle="""
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    pairs AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS n
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY a.l_suppkey, b.l_suppkey
    ),
    und AS (SELECT u, v FROM pairs WHERE n >= 3),
    edges AS (SELECT u, v FROM und UNION SELECT v, u FROM und),
    deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
    nn AS (SELECT count(*) AS n FROM deg),
    p0 AS (SELECT u AS node, 1000000000000 // nn.n AS pr FROM deg, nn),
    c1 AS (SELECT e.v AS node, sum(p.pr // g.d) AS s
           FROM edges e JOIN p0 p ON p.node = e.u JOIN deg g ON g.u = e.u
           GROUP BY e.v),
    p1 AS (SELECT g.u AS node,
                  (15 * (1000000000000 // nn.n)) // 100
                  + (85 * COALESCE(c1.s, 0)) // 100 AS pr
           FROM deg g CROSS JOIN nn LEFT JOIN c1 ON c1.node = g.u),
    c2 AS (SELECT e.v AS node, sum(p.pr // g.d) AS s
           FROM edges e JOIN p1 p ON p.node = e.u JOIN deg g ON g.u = e.u
           GROUP BY e.v),
    p2 AS (SELECT g.u AS node,
                  (15 * (1000000000000 // nn.n)) // 100
                  + (85 * COALESCE(c2.s, 0)) // 100 AS pr
           FROM deg g CROSS JOIN nn LEFT JOIN c2 ON c2.node = g.u),
    c3 AS (SELECT e.v AS node, sum(p.pr // g.d) AS s
           FROM edges e JOIN p2 p ON p.node = e.u JOIN deg g ON g.u = e.u
           GROUP BY e.v),
    p3 AS (SELECT g.u AS node,
                  (15 * (1000000000000 // nn.n)) // 100
                  + (85 * COALESCE(c3.s, 0)) // 100 AS pr
           FROM deg g CROSS JOIN nn LEFT JOIN c3 ON c3.node = g.u)
    SELECT node AS suppkey, pr::BIGINT AS pr_micro FROM p3
    """,
)
def q_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph ranking: 3 PageRank power iterations over the
    supplier co-occurrence graph (same ≥3-shared-orders edges as
    graph_triangles), certified EXACTLY against a hash oracle because the
    whole recurrence runs in bigint micro-units (operators.graph.pagerank
    — integer init/contribution/update, no floats anywhere). The oracle
    unrolls the identical recurrence as three CTE rounds."""
    from gene_level_metadata_pipeline_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("v"))
    und = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 3)
        .select("u", "v")
    )
    pr = pagerank(und, iterations=3)
    return pr.select(F.col("node").alias("suppkey"), F.col("pr").alias("pr_micro"))


@_register(
    "zorder_stats",
    oracle="""
    WITH b AS (
      SELECT l_partkey % 256 AS zx, l_suppkey % 256 AS zy FROM lineitem
    ),
    z AS (
      SELECT zx, zy,
             ((zx // 1) % 2) * 1     + ((zy // 1) % 2) * 2
           + ((zx // 2) % 2) * 4     + ((zy // 2) % 2) * 8
           + ((zx // 4) % 2) * 16    + ((zy // 4) % 2) * 32
           + ((zx // 8) % 2) * 64    + ((zy // 8) % 2) * 128
           + ((zx // 16) % 2) * 256  + ((zy // 16) % 2) * 512
           + ((zx // 32) % 2) * 1024 + ((zy // 32) % 2) * 2048
           + ((zx // 64) % 2) * 4096 + ((zy // 64) % 2) * 8192
           + ((zx // 128) % 2) * 16384 + ((zy // 128) % 2) * 32768 AS zv
      FROM b
    )
    SELECT zv // 4096 AS bucket, count(*) AS n,
           min(zx) AS min_x, max(zx) AS max_x,
           min(zy) AS min_y, max(zy) AS max_y
    FROM z GROUP BY bucket
    """,
)
def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: Morton-interleave (partkey, suppkey) low
    bytes, split the Z-range into 16 file-sized buckets, and report each
    bucket's min/max envelope on BOTH dimensions — the numbers a parquet
    reader's row-group pruning would use. With Z-ordering every bucket
    covers ≤ a 64×64 square of the 256×256 key space (vs the full range
    on the non-sort column of a 1-D sort), which is why both
    partkey-only and suppkey-only predicates prune ~15/16 of files.
    Pure integer bit arithmetic (operators.layout.zorder_value)."""
    from gene_level_metadata_pipeline_spark.operators.layout import zorder_value

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("zx"),
        (F.col("l_suppkey") % 256).alias("zy"),
    )
    z = li.withColumn("zv", zorder_value(["zx", "zy"], bits=8))
    return (
        z.groupBy((F.col("zv") / 4096).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zx").alias("min_x"), F.max("zx").alias("max_x"),
            F.min("zy").alias("min_y"), F.max("zy").alias("max_y"),
        )
    )


# ---------------------------------------------------------------------------
# Array / map / modern-SQL breadth (Spark 4 surface a complete engine owes
# its users even though the reference never touches it)
# ---------------------------------------------------------------------------

@_register(
    "hof_array_suite",
    oracle="""
    WITH a AS (
      SELECT l_orderkey,
             list(CAST(l_quantity AS BIGINT) ORDER BY CAST(l_quantity AS BIGINT)) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(qtys) AS n_items,
           list_sum(qtys)::BIGINT AS fold_sum,
           len(list_filter(qtys, x -> x >= 30)) AS big_cnt,
           len(list_filter(qtys, x -> x >= 45)) > 0 AS any_ge45,
           len(list_filter(qtys, x -> x <= 0)) = 0 AS all_pos,
           list_transform(qtys, x -> x * 2)[1] AS head_doubled,
           list_sum(list_transform(qtys, x -> x * x))::BIGINT AS sq_sum
    FROM a
    """,
)
def q_hof_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over a per-order quantity array: aggregate
    (fold), filter, exists, forall, transform, zip_with — the lambda
    surface that makes array columns first-class without UDFs. All of it
    is codegen'd JVM-side (zero EvalPython); the only shuffle is the
    orderkey groupBy that builds the array. array_sort(collect_list)
    makes the array deterministic across partitionings; every derived
    value is order-insensitive anyway, by construction."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("long"))).alias("qtys")
    )
    return a.select(
        "l_orderkey",
        F.size("qtys").cast("long").alias("n_items"),
        F.aggregate("qtys", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("fold_sum"),
        F.size(F.filter("qtys", lambda x: x >= 30)).cast("long").alias("big_cnt"),
        F.exists("qtys", lambda x: x >= 45).alias("any_ge45"),
        F.forall("qtys", lambda x: x > 0).alias("all_pos"),
        F.element_at(F.transform("qtys", lambda x: x * 2), 1).alias("head_doubled"),
        F.aggregate(
            F.zip_with("qtys", "qtys", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sq_sum"),
    )


@_register(
    "map_type_suite",
    oracle="""
    WITH per AS (
      SELECT o_custkey, o_orderstatus, count(*) AS n
      FROM orders GROUP BY o_custkey, o_orderstatus
    )
    SELECT o_custkey,
           count(*) AS n_statuses,
           coalesce(max(CASE WHEN o_orderstatus = 'O' THEN n END), 0) AS open_cnt,
           coalesce(max(CASE WHEN o_orderstatus = 'F' THEN n END), 0) AS filled_cnt,
           count(*) FILTER (WHERE n > 1) AS repeated_statuses,
           sum(n)::BIGINT AS total_orders
    FROM per GROUP BY o_custkey
    """,
)
def q_map_type_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType as a first-class value: build a status→count map per
    customer with map_from_entries, then read it back via element_at,
    size, map_filter, and aggregate over map_values. The reference's
    KV-pair tables (SURVEY §1.1, S11) stay long; this certifies the
    alternative representation Spark offers when per-key access beats
    another explode. The map itself never leaves the plan — output is
    plain columns, so the oracle is conditional aggregation."""
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("m")
    )
    return m.select(
        "o_custkey",
        F.size("m").cast("long").alias("n_statuses"),
        F.coalesce(F.element_at("m", "O"), F.lit(0)).alias("open_cnt"),
        F.coalesce(F.element_at("m", "F"), F.lit(0)).alias("filled_cnt"),
        F.size(F.map_filter("m", lambda k, v: v > 1)).cast("long").alias("repeated_statuses"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_orders"),
    )


@_register(
    "listagg_sql",
    oracle="""
    SELECT r_name,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           string_agg(DISTINCT substr(n_name, 1, 1), '' ORDER BY substr(n_name, 1, 1))
             AS initials
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_listagg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native listagg (new in Spark 4.0) with WITHIN GROUP ordering and a
    DISTINCT variant — the SQL-standard spelling of the reference's A6
    ordered string aggregation (string_agg_ordered certifies the
    DataFrame composition; this certifies the aggregate function). The
    WITHIN GROUP clause is what makes the result deterministic across
    partitionings — listagg without it is explicitly unordered."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_la")
    _t(spark, sf_dir, "region").createOrReplaceTempView("region_la")
    return spark.sql("""
        SELECT r_name,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS nations,
               listagg(DISTINCT substr(n_name, 1, 1), '')
                 WITHIN GROUP (ORDER BY substr(n_name, 1, 1)) AS initials
        FROM nation_la JOIN region_la ON n_regionkey = r_regionkey
        GROUP BY r_name
    """)


@_register(
    "percentile_family",
    oracle="""
    SELECT n_name,
           round(CAST(median(c_acctbal) AS DOUBLE), 2) AS med,
           round(CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY c_acctbal) AS DOUBLE), 2) AS p25,
           CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY c_acctbal) AS DOUBLE) AS p75_disc,
           count(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_percentile_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregates per nation: median, interpolated
    percentile_cont, and percentile_disc (the order-statistic variant —
    returns an actual data value, no interpolation). Exact percentiles
    require a per-group sort; at 100 TB the approx twin
    (approx_percentile, t-digest, see approx_profile) is the default and
    these are the audit path. Interpolation arithmetic is the identical
    IEEE expression in both engines; median/p25 are rounded to 2 digits
    to absorb the one-ulp divide divergence."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            _round_to(F.median("c_acctbal"), 2).alias("med"),
            _round_to(F.percentile("c_acctbal", F.lit(0.25)), 2).alias("p25"),
            F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY c_acctbal)")
            .cast("double").alias("p75_disc"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_register(
    "try_arithmetic",
    oracle="""
    SELECT l_linestatus,
           count(*) AS n,
           count(*) FILTER (WHERE l_extendedprice / NULLIF(l_quantity - l_quantity, 0) IS NULL)
             AS div0_nulls,
           count(*) FILTER (WHERE TRY_CAST(l_returnflag AS INT) IS NULL) AS badcast_nulls,
           count(*) FILTER (WHERE CASE WHEN l_orderkey > 1
                                       THEN NULL
                                       ELSE 9223372036854775806 + l_orderkey END IS NULL)
             AS overflow_nulls,
           round(CAST(sum(CAST(
             round(l_extendedprice / NULLIF(l_quantity, 0) * 100, 0) / 100
             AS DECIMAL(18,6))) AS DOUBLE), 2) AS unit_price_sum
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic: try_divide / try_cast / try_add return
    NULL where strict SQL raises (÷0, malformed cast, bigint overflow).
    Spark 4 runs ANSI mode ON by default, so a 100 TB job that hits one
    bad row 6 hours in ABORTS unless the pipeline speaks try_*; these are
    the engine's sanctioned escape hatches, graded per-group so the
    oracle pins exactly which rows nulled. DuckDB has no try_add —
    its oracle side models the overflow analytically (every orderkey > 1
    overflows 2^63-2)."""
    li = _t(spark, sf_dir, "lineitem")
    unit = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.try_divide(
            F.col("l_extendedprice"),
            F.col("l_quantity") - F.col("l_quantity")).isNull(), 1)).alias("div0_nulls"),
        F.count(F.when(F.expr("try_cast(l_returnflag AS INT)").isNull(), 1)).alias("badcast_nulls"),
        F.count(F.when(F.try_add(F.lit(9223372036854775806), F.col("l_orderkey")).isNull(), 1))
        .alias("overflow_nulls"),
        F.round(F.sum((F.round(unit * 100, 0) / 100).cast("decimal(18,6)")), 2)
        .cast("double").alias("unit_price_sum"),
    )


@_register(
    "lateral_topk",
    oracle="""
    SELECT c.c_custkey, x.o_orderkey AS top_orderkey, x.o_totalprice AS top_price
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) x
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL): each customer's single
    most expensive order, tie-broken by orderkey. The SQL text is IDENTICAL
    on both engines (modulo view names). Catalyst decorrelates the
    per-row ORDER BY ... LIMIT 1 into a window rank over one orders scan —
    same physical shape as the DataFrame row_number pattern
    (window_rank_suite) — rather than executing |customer| scans the way
    the syntax reads; inner joins drop customers with no orders."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lt")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lt")
    return spark.sql("""
        SELECT c.c_custkey, x.o_orderkey AS top_orderkey, x.o_totalprice AS top_price
        FROM customer_lt c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lt
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) x
    """)


@_register(
    "sql_pivot_unpivot",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS status,
           count(*) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM orders GROUP BY o_orderpriority, o_orderstatus
    """,
)
def q_sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT syntax (explicit IN list — PLANS.md lesson 6) widens
    status counts+revenue per priority, then SQL UNPIVOT melts it back to
    long form. Absent (priority, status) combos become NULL cells under
    PIVOT; UNPIVOT's default EXCLUDE NULLS drops them again, so the
    roundtrip is exactly the plain GROUP BY the oracle runs. Multi-measure
    pivot produces struct-suffixed columns (status_n, status_revenue);
    UNPIVOT's (n, revenue) FOR status IN ((o_n, o_rev) AS 'O', ...) maps
    them back."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pu")
    return spark.sql("""
        WITH wide AS (
          SELECT * FROM (
            SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders_pu
          )
          PIVOT (
            count(*) AS n,
            CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS rev
            FOR o_orderstatus IN ('O', 'F', 'P')
          )
        )
        SELECT o_orderpriority, status, n, revenue
        FROM wide
        UNPIVOT (
          (n, revenue) FOR status IN ((`O_n`, `O_rev`) AS `O`,
                                      (`F_n`, `F_rev`) AS `F`,
                                      (`P_n`, `P_rev`) AS `P`)
        )
    """)


@_register(
    "null_safe_join",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
                  ELSE o_orderpriority END AS pk,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
                  ELSE o_orderpriority END AS pk,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT a.pk, a.n_orders, b.revenue
    FROM a JOIN b ON a.pk IS NOT DISTINCT FROM b.pk
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / eqNullSafe): NULL keys MATCH each
    other instead of vanishing, the semantics dimension normal equi-joins
    silently drop rows on. One priority is nulled on both sides; the
    null-safe join keeps it (5 rows, not 4). Catalyst still plans <=> as
    a hash join (null-safe keys hash like values) — not the nested-loop
    fallback a theta join would cost."""
    o = _t(spark, sf_dir, "orders")
    pk = F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    a = o.groupBy(pk.alias("pk")).agg(F.count(F.lit(1)).alias("n_orders"))
    b = o.groupBy(pk.alias("pk")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double").alias("revenue")
    )
    return a.join(b, a.pk.eqNullSafe(b.pk)).select(a.pk, "n_orders", "revenue")


@_register(
    "group_by_all_offset",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS n
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    LIMIT 6 OFFSET 3
    """,
)
def q_group_by_all_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL / LIMIT-OFFSET pagination — modern SQL
    shorthand (DuckDB pioneered it; Spark 3.4+ adopted it) running as
    IDENTICAL text on both engines. ORDER BY ALL totally orders the
    result, which is the precondition that makes OFFSET pagination
    deterministic; Spark plans the offset into the same single-partition
    TakeOrdered step as the limit — no global sort materializes."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders_gba
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 6 OFFSET 3
    """)


@_register(
    "transpose_native",
    oracle="""
    SELECT 'revenue' AS key,
           round(CAST(sum(CAST(CASE WHEN r_name = 'AFRICA' THEN o_totalprice END
             AS DECIMAL(18,6))) AS DOUBLE), 2) AS "AFRICA",
           round(CAST(sum(CAST(CASE WHEN r_name = 'AMERICA' THEN o_totalprice END
             AS DECIMAL(18,6))) AS DOUBLE), 2) AS "AMERICA",
           round(CAST(sum(CAST(CASE WHEN r_name = 'ASIA' THEN o_totalprice END
             AS DECIMAL(18,6))) AS DOUBLE), 2) AS "ASIA",
           round(CAST(sum(CAST(CASE WHEN r_name = 'EUROPE' THEN o_totalprice END
             AS DECIMAL(18,6))) AS DOUBLE), 2) AS "EUROPE",
           round(CAST(sum(CAST(CASE WHEN r_name = 'MIDDLE EAST' THEN o_totalprice END
             AS DECIMAL(18,6))) AS DOUBLE), 2) AS "MIDDLE EAST"
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_transpose_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native DataFrame.transpose (new in Spark 4.0): flip a 5-row
    (region, revenue) aggregate into one wide row keyed by the former
    column names. Transpose COLLECTS the first column to the driver to
    name the output columns — fine on a dimension-grain aggregate (5
    rows), catastrophic on a fact table; the engine's long-form melt
    (R4, transpose_matrix) remains the scale path for genuine matrices
    (SURVEY §4 'matrix ops in long form')."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double").alias("revenue")
        )
        .orderBy("r_name")
    )
    return agg.transpose().withColumnRenamed("key", "key")


@_register(
    "string_breadth",
    oracle="""
    SELECT n_name,
           levenshtein(n_name, 'UNITED STATES') AS lev_us,
           translate(n_name, 'AEIOU', 'aeiou') AS devowel,
           lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded_key,
           reverse(n_name) AS rev_name,
           repeat(substr(n_name, 1, 1), 3) AS tripled_initial,
           CAST(ascii(n_name) AS BIGINT) AS first_byte,
           length(n_name) AS name_len
    FROM nation
    """,
)
def q_string_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth beyond the reference's regex family (§2.10):
    levenshtein edit distance (the building block for fuzzy gene-symbol
    alias matching — blocked nearest-alias joins at scale pair it with a
    first-letter or length band), translate, lpad (zero-padding IDs for
    lexicographic = numeric sort order), reverse, repeat, ascii, length.
    All JVM built-ins, map-side only — zero shuffles in this plan."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.levenshtein("n_name", F.lit("UNITED STATES")).cast("long").alias("lev_us"),
        F.translate("n_name", "AEIOU", "aeiou").alias("devowel"),
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("padded_key"),
        F.reverse("n_name").alias("rev_name"),
        F.repeat(F.substring("n_name", 1, 1), 3).alias("tripled_initial"),
        F.ascii("n_name").cast("long").alias("first_byte"),
        F.length("n_name").cast("long").alias("name_len"),
    )


@_register(
    "salted_join_revenue",
    oracle="""
    SELECT s_nationkey, count(*) AS n_items,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
             AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (operators.skew.salted_join): the fact side
    is salted by row hash, the dim side replicated salt_buckets×, and the
    join runs on (key, salt) — one hot supplier's rows spread over 8
    reducers instead of one straggler task. Result is bit-identical to
    the plain join (the oracle IS the plain join). Static complement to
    AQE's runtime skew split (proven in tests/test_bucketing.py); the
    equality + physical-shape assertions live in tests/test_skew_join.py."""
    from gene_level_metadata_pipeline_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    j = salted_join(li, su, "l_suppkey", "s_suppkey", salt_buckets=8)
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@_register(
    "embedding_quantize_int8",
    oracle="""
    WITH base AS (
      SELECT vec_id,
             greatest(list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-12) AS q_scale,
             embedding
      FROM embeddings
    ),
    el AS (
      SELECT vec_id, q_scale,
             generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM base
    ),
    t AS (
      SELECT vec_id, q_scale, pos, x,
             CAST(round(x / q_scale) AS BIGINT) AS qe
      FROM el
    )
    SELECT vec_id, q_scale,
           count(*) AS n_dims,
           max(CASE WHEN pos = 1 THEN qe END) AS q_head,
           sum(abs(qe))::BIGINT AS q_l1,
           round(CAST(sum(CAST(x * (qe * q_scale) AS DECIMAL(25,12))) AS DOUBLE)
                 / (sqrt(CAST(sum(CAST(x * x AS DECIMAL(25,12))) AS DOUBLE))
                    * sqrt(CAST(sum(CAST((qe * q_scale) * (qe * q_scale) AS DECIMAL(25,12)))
                           AS DOUBLE))), 6) AS cos_recon,
           round(max(abs(x - qe * q_scale)), 9) AS max_abs_err
    FROM t GROUP BY vec_id, q_scale
    """,
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization audit (operators.similarity.
    quantize_embeddings): per-vector symmetric scale, q = round(x/scale),
    then — exploded to long form, the §4 'matrices stay long' rule —
    exact-decimal dot products proving reconstructed cosine ≈ 1 and
    per-element error ≤ scale/2. 4× storage cut for the 100 TB ANN path;
    candidate generation (IVF cells, LSH signs) is unaffected because it
    runs before quantization. Decimal sums keep the fold order-independent
    (PLANS.md 'exactness vs throughput')."""
    from gene_level_metadata_pipeline_spark.operators.similarity import quantize_embeddings

    d = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    el = d.select(
        "vec_id", "q_scale",
        F.posexplode(F.arrays_zip("embedding", "q_vec")).alias("pos", "z"),
    ).select(
        "vec_id", "q_scale", "pos",
        F.col("z.embedding").cast("double").alias("x"),
        F.col("z.q_vec").alias("qe"),
    )
    recon = F.col("qe") * F.col("q_scale")
    dec = "decimal(25,12)"
    g = el.groupBy("vec_id", "q_scale").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.max(F.when(F.col("pos") == 0, F.col("qe"))).alias("q_head"),
        F.sum(F.abs(F.col("qe"))).alias("q_l1"),
        F.sum((F.col("x") * recon).cast(dec)).alias("_vr"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("_vv"),
        F.sum((recon * recon).cast(dec)).alias("_rr"),
        F.max(F.abs(F.col("x") - recon)).alias("_maxerr"),
    )
    return g.select(
        "vec_id", "q_scale", "n_dims", "q_head", "q_l1",
        _round_to(
            F.col("_vr").cast("double")
            / (F.sqrt(F.col("_vv").cast("double")) * F.sqrt(F.col("_rr").cast("double"))),
            6,
        ).alias("cos_recon"),
        _round_to(F.col("_maxerr"), 9).alias("max_abs_err"),
    )


@_register(
    "cogroup_asof_join",
    oracle="""
    WITH err AS (
      SELECT user_id, event_id, epoch_us(ts) AS ets FROM events
      WHERE event_type = 'error'
    ),
    clk AS (
      SELECT user_id, epoch_us(ts) AS cts, value FROM events
      WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT e.user_id, e.event_id,
             c.cts, c.value,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY c.cts DESC, c.value DESC) AS rn
      FROM err e LEFT JOIN clk c
        ON e.user_id = c.user_id AND c.cts <= e.ets
    )
    SELECT user_id, event_id,
           value AS right_value,
           cts AS right_us
    FROM ranked WHERE rn = 1
    """,
)
def q_cogroup_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via cogrouped applyInPandas: both sides co-partition on
    user_id, each group pair lands in ONE Arrow batch, pandas merge_asof
    does the per-user backward search. Cross-validates the Python
    cogroup path against the same SQL oracle as the relational as-of
    (asof_join_events) — two implementations, one truth. The relational
    union+window form stays the scale default (no Python, no per-group
    batch memory); cogroup is the escape hatch for per-group logic
    DataFrame ops can't express. Ties broken like ORDER BY cts DESC,
    value DESC via the right side's (us, value) ascending sort —
    merge_asof takes the LAST equal-timestamp row."""
    import pandas as pd

    ev = _events(spark, sf_dir).withColumn("us", F.unix_micros("ts"))
    err = ev.where(F.col("event_type") == "error").select("user_id", "event_id", "us")
    clk = ev.where(F.col("event_type") == "click").select("user_id", "us", "value")

    def merge(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        if len(left) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "event_id": pd.Series(dtype="int64"),
                 "right_value": pd.Series(dtype="Float64"),
                 "right_us": pd.Series(dtype="Int64")}
            )
        left = left.sort_values("us")
        right = right.sort_values(["us", "value"])
        right = right.assign(right_us=right["us"], right_value=right["value"])[
            ["us", "right_us", "right_value"]
        ]
        if len(right) == 0:
            out = left.assign(right_value=float("nan"), right_us=float("nan"))
        else:
            out = pd.merge_asof(left, right, on="us", direction="backward")
        out = out[["user_id", "event_id", "right_value", "right_us"]]
        out["right_us"] = out["right_us"].astype("Int64")
        out["right_value"] = out["right_value"].astype("Float64")
        return out

    return (
        err.groupBy("user_id")
        .cogroup(clk.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="user_id bigint, event_id bigint, right_value double, right_us bigint",
        )
    )


@_register(
    "redact_pii",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or +1-555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
             AS n_emails,
           len(regexp_extract_all(t, '\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS n_phones,
           length(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_len,
           NOT contains(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '@')
             AS email_clean
    FROM aug
    """,
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training corpora: email + phone patterns found,
    replaced with typed placeholders, and audited (match counts + a
    post-redaction cleanliness probe). The synthetic corpus carries no
    PII, so both engines deterministically inject doc_id-derived
    addresses into every third document first — the redaction machinery
    (global regexp_replace, regexp_count/extract_all, residue check) is
    what's certified. Patterns stay in the Java∩RE2 regex intersection;
    DuckDB's regexp_replace needs the explicit 'g' flag where Spark's is
    global by default. Map-side only — zero shuffles."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    d = _t(spark, sf_dir, "documents")
    aug = d.withColumn(
        "t",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"), F.lit(" contact user"),
                F.col("doc_id").cast("string"), F.lit("@example.com or +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")),
    )
    red = F.regexp_replace(
        F.regexp_replace(F.col("t"), email, "<EMAIL>"), phone, "<PHONE>"
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(phone)).cast("long").alias("n_phones"),
        F.length(red).cast("long").alias("redacted_len"),
        (~F.regexp_replace(F.col("t"), email, "<EMAIL>").contains("@")).alias("email_clean"),
    )


@_register(
    "sql_udf_scalar_tvf",
    oracle="""
    SELECT n_name,
           upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2)
             AS sentence_name,
           i
    FROM nation, LATERAL (
      SELECT CAST(unnest(generate_series(1, CAST(n_nationkey % 3 + 1 AS INT))) AS INT) AS i
    ) t
    """,
)
def q_sql_udf_scalar_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (new in Spark 4.0): a scalar function (the
    reference's X13 sentence_case — no Catalyst built-in exists, and a
    SQL UDF keeps it codegen-inlined where a Python UDF would break the
    stage) and a table-valued function applied with correlated LATERAL
    (per-nation row replication). Both are declared in SQL, registered in
    the session catalog, and inline into the optimized plan — zero
    EvalPython. DuckDB oracles them with the expanded expressions (its
    macro system is the analogue)."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_su")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION sent_case(s STRING) RETURNS STRING
        RETURN concat(upper(substring(lower(s), 1, 1)), substring(lower(s), 2))
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION rep_n(n INT) RETURNS TABLE(i INT)
        RETURN SELECT explode(sequence(1, n)) AS i
    """)
    return spark.sql("""
        SELECT n_name, sent_case(n_name) AS sentence_name, i
        FROM nation_su, LATERAL rep_n(CAST(n_nationkey % 3 + 1 AS INT))
    """)


@_register(
    "param_sql_filter",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 50000
    GROUP BY o_orderpriority
    """,
)
def q_param_sql_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args={...})): parameters bind
    as typed literals in the analyzed plan — injection-safe by
    construction and constant-folded like any literal, so predicate
    pushdown sees plain comparisons (status/price reach PushedFilters).
    The oracle inlines the same values."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pq")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM orders_pq
        WHERE o_orderstatus = :status AND o_totalprice >= :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "floor": 50000},
    )


@_register(
    "generator_tvf_suite",
    oracle="""
    WITH a AS (
      SELECT n_name AS src, CAST(i - 1 AS INT) AS pos, 'elem' AS k,
             CAST([n_nationkey, n_regionkey,
                   n_nationkey + n_regionkey][i] AS VARCHAR) AS v
      FROM nation, (SELECT unnest(generate_series(1, 3)) AS i)
    ),
    b AS (
      SELECT n_name, 0, 'rk', CAST(n_regionkey AS VARCHAR) FROM nation
      UNION ALL
      SELECT n_name, 1, 'nk', CAST(n_nationkey AS VARCHAR) FROM nation
    ),
    c AS (
      SELECT n_name, -1, 'name', n_name FROM nation
      UNION ALL
      SELECT n_name, -1, 'keysum',
             CAST(n_nationkey + n_regionkey AS VARCHAR) FROM nation
    )
    SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c
    """,
)
def q_generator_tvf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator (table-valued) function breadth (§2.6 row-expansion
    general forms): posexplode (element + ordinal — the positional twin
    of R1's separate_rows), inline (array<struct> → columns, the typed
    way to expand packed repeated groups), and stack (N-column unpivot
    literal, the SQL-text twin of melt). One generator per SELECT is a
    Spark analyzer rule, so the three live in unioned branches; each
    branch stays a map-side Generate node — the union introduces no
    exchange, and the whole plan is scan→generate→union with zero
    shuffles."""
    n = _t(spark, sf_dir, "nation")
    a = n.select(
        F.col("n_name").alias("src"),
        F.posexplode(
            F.array(
                F.col("n_nationkey"),
                F.col("n_regionkey"),
                F.col("n_nationkey") + F.col("n_regionkey"),
            )
        ).alias("pos", "val"),
    ).select(
        "src",
        F.col("pos").cast("int").alias("pos"),
        F.lit("elem").alias("k"),
        F.col("val").cast("string").alias("v"),
    )
    b = n.select(
        F.col("n_name").alias("src"),
        F.inline(
            F.array(
                F.struct(
                    F.lit(0).alias("pos"),
                    F.lit("rk").alias("k"),
                    F.col("n_regionkey").cast("string").alias("v"),
                ),
                F.struct(
                    F.lit(1).alias("pos"),
                    F.lit("nk").alias("k"),
                    F.col("n_nationkey").cast("string").alias("v"),
                ),
            )
        ),
    )
    c = n.selectExpr(
        "n_name AS src",
        "CAST(-1 AS INT) AS pos",
        "stack(2, 'name', n_name, 'keysum',"
        " CAST(n_nationkey + n_regionkey AS STRING)) AS (k, v)",
    )
    return a.unionAll(b).unionAll(c)


@_register(
    "bitwise_suite",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           bit_and(o_orderkey) AS k_and,
           bit_or(o_orderkey) AS k_or,
           bit_xor(o_orderkey) AS k_xor,
           CAST(bit_count(bit_or(o_orderkey)) AS BIGINT) AS or_bits,
           (bit_xor(o_orderkey) & 1023) AS xor_low,
           (~bit_and(o_orderkey)) AS and_not,
           (bit_and(o_orderkey) << 1) AS and_shl,
           (bit_or(o_orderkey) >> 2) AS or_shr
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate family (beyond the reference's scalar
    surface, §2.10): bit_and/bit_or/bit_xor aggregates — mergeable
    map-side like any semigroup, so the plan is one partial+final
    hash aggregate — plus scalar &, ~, shifts and bit_count on the
    aggregated values. Bit-aggregates are how flag columns (set
    membership masks, permission bits, bloom words) fold at 100 TB:
    8 bytes of state per group regardless of row count."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.bit_and("o_orderkey").alias("k_and"),
        F.bit_or("o_orderkey").alias("k_or"),
        F.bit_xor("o_orderkey").alias("k_xor"),
    )
    return agg.select(
        "o_orderpriority",
        "n",
        "k_and",
        "k_or",
        "k_xor",
        F.bit_count("k_or").cast("bigint").alias("or_bits"),
        F.col("k_xor").bitwiseAND(F.lit(1023)).alias("xor_low"),
        F.bitwise_not("k_and").alias("and_not"),
        F.shiftleft(F.col("k_and"), 1).alias("and_shl"),
        F.shiftright(F.col("k_or"), 2).alias("or_shr"),
    )


@_register(
    "cube_grouping",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets + grouping() disambiguation flags (completes
    the grouping-sets family next to `rollup_revenue`): all four
    (status, priority) marginals in ONE pass — Spark expands the cube
    into a single Expand node feeding one hash aggregate, so the fact
    is scanned once however many grouping sets are requested, the same
    property that makes multi-marginal 100 TB reporting a single job.
    grouping(col)=1 marks the rolled-up NULL apart from a data NULL.
    Identical SQL text runs on both engines (only the view name
    differs)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_cube_pq")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               count(*) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS revenue
        FROM orders_cube_pq
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        """
    )


@_register(
    "crosstab_status_priority",
    oracle="""
    SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
           CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
           CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
           CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
           CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_crosstab_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.stat.crosstab — pairwise contingency table (the df.stat twin of
    R2 pivot_wider with count fill). Internally one groupBy on the pair
    + a driver-side pivot of the DISTINCT column-value set, so it is
    safe exactly when that set is small (here: 5 priorities); at 100 TB
    the row-label side streams through a single hash aggregate while
    the column side must stay enumerable — same contract as any pivot.
    The oracle spells it as filtered counts, which is also the shape
    Spark compiles the pivot into."""
    o = _t(spark, sf_dir, "orders")
    return o.stat.crosstab("o_orderstatus", "o_orderpriority")


@_register(
    "json_export",
    oracle="""
    SELECT n_name,
           CAST(to_json(struct_pack(
               key := n_nationkey, name := n_name,
               ids := [n_regionkey, n_nationkey])) AS VARCHAR) AS js_struct,
           CAST(to_json([
               struct_pack(k := 'region', v := n_regionkey),
               struct_pack(k := 'nation', v := n_nationkey)
           ]) AS VARCHAR) AS js_arr
    FROM nation
    """,
)
def q_json_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json serialization (the export inverse of `json_props_extract`'s
    from_json): struct → object with field order preserved, array<struct>
    → object array — byte-identical compact JSON across engines, which is
    what makes JSONL a safe interchange sink for nested rows (K2's
    general form). Pure codegen projection, zero shuffles."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.to_json(
            F.struct(
                F.col("n_nationkey").alias("key"),
                F.col("n_name").alias("name"),
                F.array(F.col("n_regionkey"), F.col("n_nationkey")).alias("ids"),
            )
        ).alias("js_struct"),
        F.to_json(
            F.array(
                F.struct(
                    F.lit("region").alias("k"), F.col("n_regionkey").alias("v")
                ),
                F.struct(
                    F.lit("nation").alias("k"), F.col("n_nationkey").alias("v")
                ),
            )
        ).alias("js_arr"),
    )


@_register(
    "string_format_family",
    oracle="""
    SELECT n_name,
           printf('%s|%04d', n_name, n_nationkey) AS tagged,
           array_to_string(
             list_transform(string_split(lower(n_name), ' '),
                            w -> upper(w[1:1]) || w[2:]),
             ' ') AS title_case,
           CAST(list_position([n_regionkey, n_nationkey, 99],
                              n_nationkey) AS INT) AS self_pos,
           concat_ws('/', n_name, CAST(n_regionkey AS VARCHAR)) AS joined
    FROM nation
    """,
)
def q_string_format_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_string (printf templating — the typed alternative to string
    concat chains for ID minting), initcap (X13 sentence_case's per-word
    cousin; the oracle spells Spark's exact per-word semantics with a
    DuckDB lambda), array_position (1-based, 0 when absent — matching
    SQL FIND_IN_SET conventions), concat_ws. All map-side codegen."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.format_string("%s|%04d", F.col("n_name"), F.col("n_nationkey")).alias(
            "tagged"
        ),
        F.initcap(F.lower("n_name")).alias("title_case"),
        F.array_position(
            F.array(F.col("n_regionkey"), F.col("n_nationkey"), F.lit(99)),
            F.col("n_nationkey"),
        ).cast("int").alias("self_pos"),
        F.concat_ws("/", F.col("n_name"), F.col("n_regionkey").cast("string")).alias(
            "joined"
        ),
    )


@_register(
    "datetime_epoch_family",
    oracle="""
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date,
           make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start,
           CAST((year(o_orderdate) - 1995) * 12
                + (month(o_orderdate) - 1) AS DOUBLE) AS months_since_95,
           CAST(epoch(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))
                AS BIGINT) AS epoch_s,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d 00:00:00')
               AS rendered,
           CAST(o_orderdate AS DATE)
             + CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                         ELSE (8 - isodow(o_orderdate)) % 7 END
                    AS INTEGER) AS next_monday,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1
    FROM orders
    """,
)
def q_datetime_epoch_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/calendar scalar family completing `datetime_functions`
    (§2.10 X20 temporal corner): make_date construction, months_between
    on month boundaries (integral doubles — the only hash-safe use of
    its fractional semantics), unix_timestamp/from_unixtime epoch
    roundtrip, next_day, and Sunday=1 dayofweek alignment (Spark's
    convention, spelled as dow+1 in DuckDB). Self-sufficient: pins UTC
    so date→timestamp epoch agrees with DuckDB's timezone-free dates —
    the same session contract as `_events`."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    o = (
        _t(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("order_date"))
        .distinct()
    )
    ts = F.col("order_date").cast("timestamp")
    return o.select(
        "order_date",
        F.make_date(F.year("order_date"), F.month("order_date"), F.lit(1)).alias(
            "month_start"
        ),
        F.months_between(
            F.make_date(F.year("order_date"), F.month("order_date"), F.lit(1)),
            F.make_date(F.lit(1995), F.lit(1), F.lit(1)),
        ).alias("months_since_95"),
        F.unix_timestamp(ts).alias("epoch_s"),
        F.from_unixtime(F.unix_timestamp(ts), "yyyy-MM-dd HH:mm:ss").alias(
            "rendered"
        ),
        F.next_day("order_date", "Mon").alias("next_monday"),
        F.dayofweek("order_date").cast("int").alias("dow_sun1"),
    )


@_register(
    "theta_set_analytics",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey % 997 AS v FROM orders
               WHERE o_orderstatus = 'O'),
         b AS (SELECT DISTINCT o_custkey % 997 AS v FROM orders
               WHERE o_orderstatus = 'F')
    SELECT (SELECT count(*) FROM a) AS n_open,
           (SELECT count(*) FROM b) AS n_filled,
           (SELECT count(*) FROM
              (SELECT v FROM a UNION SELECT v FROM b)) AS n_union,
           (SELECT count(*) FROM
              (SELECT v FROM a INTERSECT SELECT v FROM b)) AS n_both,
           (SELECT count(*) FROM
              (SELECT v FROM a EXCEPT SELECT v FROM b)) AS n_only_open
    """,
)
def q_theta_set_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Spark 4.1 DataSketches): DISTINCT-set algebra —
    union, intersection, difference cardinalities — from two one-pass
    mergeable sketches instead of three DISTINCT shuffles. THE pattern
    for 100 TB audience overlap ("users in corpus A and B"): build
    per-partition sketches map-side, merge 4 KB states, never shuffle
    raw keys; sketches persist as binary columns so daily sketches roll
    up to any window. Below k=4096 retained entries a theta sketch is
    in exact mode (θ=1, every hash kept), so with the key domain
    bounded to 997 the estimates ARE the exact counts at every SF —
    which is what lets DuckDB's exact set ops oracle a sketch query."""
    o = _t(spark, sf_dir, "orders")
    sk = o.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderstatus = 'O'"
            " THEN o_custkey % 997 END)"
        ).alias("sa"),
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderstatus = 'F'"
            " THEN o_custkey % 997 END)"
        ).alias("sb"),
    )
    return sk.select(
        F.expr("CAST(theta_sketch_estimate(sa) AS BIGINT)").alias("n_open"),
        F.expr("CAST(theta_sketch_estimate(sb) AS BIGINT)").alias("n_filled"),
        F.expr(
            "CAST(theta_sketch_estimate(theta_union(sa, sb)) AS BIGINT)"
        ).alias("n_union"),
        F.expr(
            "CAST(theta_sketch_estimate(theta_intersection(sa, sb)) AS BIGINT)"
        ).alias("n_both"),
        F.expr(
            "CAST(theta_sketch_estimate(theta_difference(sa, sb)) AS BIGINT)"
        ).alias("n_only_open"),
    )


@_register(
    "approx_topk_exact_regime",
    oracle="""
    SELECT o_orderpriority AS priority, count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_approx_topk_exact_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k (Spark 4.1 frequent-items sketch): heavy hitters in
    one pass with bounded state — the streaming-safe, mergeable upgrade
    of freqItems. When distinct items ≤ maxItemsTracked the sketch
    tracks every item exactly (no eviction ⇒ exact counts — the regime
    this 5-value column is permanently in), so the top-5 IS the exact
    group-by; above it, counts become lower bounds with a documented
    error cap. Exploded to rows so the unordered hash compare ignores
    the sketch's count-desc tie order."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.agg(F.expr("approx_top_k(o_orderpriority, 5)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("priority"),
            F.col("e.count").cast("bigint").alias("n"),
        )
    )

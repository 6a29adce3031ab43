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
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )
    return harmonize(spn, src, "c_custkey")

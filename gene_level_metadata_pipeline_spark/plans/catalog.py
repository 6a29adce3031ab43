"""Named-table catalog replacing the reference's R global environment.

The reference passes data between scripts through implicit globals
(``gene_effect`` set at ``scripts/import/temp-import-all-web-files.R:7`` and
consumed at ``scripts/tidy/temp-tidy-all-web-files.R:12`` — SURVEY.md §1.1).
The engine makes that coupling explicit: a catalog of named DataFrames, each
also registered as a Spark temp view so SQL and DataFrame code share one
namespace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Catalog", "load_testdata"]

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


class Catalog:
    """Dict-like registry of named DataFrames mirrored as temp views."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    def put(self, name: str, df: DataFrame, cache: bool = False) -> DataFrame:
        if cache:
            df = df.cache()
        df.createOrReplaceTempView(name)
        self._tables[name] = df
        return df

    def get(self, name: str) -> DataFrame:
        return self._tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tables

    def names(self) -> list[str]:
        return sorted(self._tables)


def load_testdata(spark: SparkSession, sf_dir: str) -> Catalog:
    """Register every driver parquet table under its bare name."""
    cat = Catalog(spark)
    for t in TESTDATA_TABLES:
        cat.put(t, spark.read.parquet(f"{sf_dir}/{t}.parquet"))
    return cat

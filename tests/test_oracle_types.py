"""Oracle output-type sweep (VERDICT r1 'What's wrong' class, pinned).

The driver value-hashes typed results, so a DuckDB oracle emitting
HUGEINT/DECIMAL (uncast ``sum()``, decimal-literal arithmetic) hash-
mismatches a value-identical Spark BIGINT/DOUBLE column — the only
failure class in round 1. This test runs EVERY registered oracle on
DuckDB at sf0.001 and asserts no suspect output type, so the class
cannot regress as the registry grows. Pure DuckDB — no Spark session.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SUSPECT = (
    "HUGEINT", "UHUGEINT", "INT128", "DECIMAL", "TINYINT", "UTINYINT",
    "SMALLINT", "USMALLINT", "UINTEGER", "UBIGINT", "FLOAT",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return c


def test_every_oracle_emits_driver_safe_types(con):
    from gene_level_metadata_pipeline_spark.plans.driver_queries import ORACLE

    bad = []
    for name, sql in ORACLE.items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if t.startswith(SUSPECT) or t in SUSPECT:
                bad.append((name, col, t))
    assert not bad, (
        "oracles emitting types the driver hashes differently from "
        f"Spark's (add CAST ... AS BIGINT/DOUBLE): {bad}"
    )

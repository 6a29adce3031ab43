"""S14/J3/J4/J7 local certification insurance (VERDICT r1 item 8).

The edge-decoration family (STRING PPI two-hop, T:139-191) was outside
the driver's sampled 50 in round 1; these tests certify it regardless of
which subset the driver draws next:

* a parity golden on a SKEWED hub-protein fixture — one hub protein
  carries most edges, the shape AQE skew-join handles at scale;
* plan assertions that the endpoint/ID-map dimensions are broadcast
  (no shuffle of the edge list onto dimension keys).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.plans import gene_pipeline as gp
from tests.conftest import SF_SMOKE


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_string_ppi_skewed_hub_golden(spark):
    # 1 hub protein (P1) with 40 edges + a 2-protein tail; every hub edge
    # must decorate both endpoints, scale the score, and strip prefixes.
    n_tail = 40
    genes = spark.createDataFrame(
        [("HUB", "HGNC:0", "ENSG0")]
        + [(f"G{i}", f"HGNC:{i}", f"ENSG{i}") for i in range(1, n_tail + 1)],
        ["symbol", "hgnc_id", "ensembl_gene_id"],
    )
    string_map = spark.createDataFrame(
        [("ENSG0", "9606.P0")]
        + [(f"ENSG{i}", f"9606.P{i}") for i in range(1, n_tail + 1)],
        ["ensembl_gene_id", "STRING_id"],
    )
    interactions = spark.createDataFrame(
        [(f"9606.P0", f"9606.P{i}", 700 + i) for i in range(1, n_tail + 1)],
        ["from", "to", "combined_score"],
    )
    spn = gp.gene_spine(genes)
    out = gp.string_ppi(interactions, genes, string_map, spn)
    rows = [r for r in out.collect() if r["combined_score"] is not None]
    # every hub edge decorated end-to-end
    assert len(rows) == n_tail
    assert all(r["hgnc_gene_symbol"] == "HUB" for r in rows)
    assert {r["Interaction_hgnc_gene_symbol"] for r in rows} == {
        f"G{i}" for i in range(1, n_tail + 1)
    }
    assert all(r["string_id"] == "P0" for r in rows)  # prefix stripped
    assert all(0 < r["combined_score"] <= 1 for r in rows)  # scaled
    # spine NULL-padding intact for edgeless genes
    padded = {r["hgnc_gene_symbol"] for r in out.collect()
              if r["combined_score"] is None}
    assert padded == {f"G{i}" for i in range(1, n_tail + 1)}


def test_edge_decoration_broadcasts_dimensions(spark):
    """The registered edge_decoration query must broadcast both endpoint
    dimensions — the edge list is the only shuffled/scanned big side."""
    from gene_level_metadata_pipeline_spark.plans.driver_queries import QUERIES

    plan = _executed_plan(QUERIES["edge_decoration"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # and no sort-merge join of the edge list onto a dimension
    assert "SortMergeJoin" not in plan, plan


def test_string_ppi_id_map_join_is_broadcast(spark):
    """J7: the STRINGdb ID-map join (I:72 removeUnmappedRows=TRUE ≡ inner
    join) must resolve to a broadcast join, not a shuffle."""
    genes = spark.createDataFrame(
        [("G1", "HGNC:1", "ENSG1"), ("G2", "HGNC:2", "ENSG2")],
        ["symbol", "hgnc_id", "ensembl_gene_id"],
    )
    string_map = spark.createDataFrame(
        [("ENSG1", "9606.P1"), ("ENSG2", "9606.P2")],
        ["ensembl_gene_id", "STRING_id"],
    )
    interactions = spark.createDataFrame(
        [("9606.P1", "9606.P2", 900)], ["from", "to", "combined_score"]
    )
    spn = gp.gene_spine(genes)
    plan = _executed_plan(gp.string_ppi(interactions, genes, string_map, spn))
    assert "BroadcastHashJoin" in plan, plan

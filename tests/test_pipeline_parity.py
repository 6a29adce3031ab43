"""Golden end-to-end parity tests: the reference tidy flow (EP2/EP3) on
reference-shaped fixtures (FIXTURES.md F1/F4/F5 analogs), hand-checked
expected outputs (SURVEY.md §5 item 4)."""

from __future__ import annotations

import pytest

from gene_level_metadata_pipeline_spark.plans import gene_pipeline as gp


@pytest.fixture(scope="module")
def genes(spark):
    # F1 analog: symbol spine source with pipe-packed multi-value columns,
    # "" sentinels, a NULL symbol, and a 2-MGI-id conflict on GENE2
    return spark.createDataFrame(
        [
            ("GENE1", "OLD1|OLD2", "gene one protein", "MGI:1"),
            ("GENE2", "", "GENE TWO", "MGI:2|MGI:3"),
            ("GENE3", None, "", "MGI:4"),
            (None, "GHOST", "no symbol row", "MGI:9"),
            ("GENE1", "OLD1|OLD2", "gene one protein", "MGI:1"),  # exact dup
        ],
        ["symbol", "prev_symbol", "name", "mgd_id"],
    )


@pytest.fixture(scope="module")
def spn(genes):
    return gp.gene_spine(genes)


def test_spine_golden(spn):
    assert sorted(r[0] for r in spn.collect()) == ["GENE1", "GENE2", "GENE3"]


def test_prev_names_golden(genes, spn):
    rows = {(r["hgnc_gene_symbol"], r["prev_symbol"])
            for r in gp.prev_names(genes, spn).collect()}
    # pipe-split fan-out, ""->NULL, spine NULL-padding
    assert rows == {
        ("GENE1", "OLD1"), ("GENE1", "OLD2"),
        ("GENE2", None), ("GENE3", None),
    }


def test_gene_names_sentence_case_golden(genes, spn):
    rows = {(r["hgnc_gene_symbol"], r["gene_name"])
            for r in gp.gene_names(genes, spn).collect()}
    assert rows == {
        ("GENE1", "Gene one protein"),   # str_to_sentence(str_to_lower(x))
        ("GENE2", "Gene two"),
        ("GENE3", None),                 # "" -> NULL survives sentence-case
    }


def test_symbol_id_mappings_golden(genes, spn):
    rows = {(r["hgnc_gene_symbol"], r["mgd_id"])
            for r in gp.symbol_id_mappings(genes, spn, "mgd_id").collect()}
    assert rows == {
        ("GENE1", "MGI:1"), ("GENE2", "MGI:2"), ("GENE2", "MGI:3"),
        ("GENE3", "MGI:4"),
    }


@pytest.fixture(scope="module")
def idmap(spark):
    # exploded mgd_id mapping incl. the conflict: MGI:2 and MGI:3 both map
    # to GENE2; MGI:5 maps to two different symbols (ambiguity fodder)
    return spark.createDataFrame(
        [("GENE1", "MGI:1"), ("GENE2", "MGI:2"), ("GENE2", "MGI:3"),
         ("GENE3", "MGI:4")],
        ["hgnc_gene_symbol", "mgi_id"],
    )


def test_viability_keep_unique_golden(spark, spn, idmap):
    # GENE2 gets conflicting viable/lethal evidence via its two MGI ids ->
    # dropped by keep_unique (T:213-219); comment rows filtered (T:203)
    mouse = spark.createDataFrame(
        [("MGI:1", "viable", ""), ("MGI:2", "lethal", ""),
         ("MGI:3", "viable", ""), ("MGI:4", "lethal", "conflicting evidence")],
        ["mgi_id", "viability", "comment"],
    )
    rows = {(r["hgnc_gene_symbol"], r["viability"])
            for r in gp.viability(mouse, idmap, spn, mode="keep_unique").collect()}
    assert rows == {
        ("GENE1", "viable"),
        ("GENE2", None),   # ambiguous -> dropped, NULL-padded by spine
        ("GENE3", None),   # only evidence had a comment -> filtered
    }


def test_viability_null_conflicts_golden(spark, spn, idmap):
    mouse = spark.createDataFrame(
        [("MGI:1", "viable"), ("MGI:2", "lethal"), ("MGI:3", "viable")],
        ["mgi_id", "viability"],
    )
    rows = {(r["hgnc_gene_symbol"], r["viability"])
            for r in gp.viability(mouse, idmap, spn, mode="null_conflicts").collect()}
    # T:273-277: GENE2 keeps its row but the payload is nulled
    assert rows == {("GENE1", "viable"), ("GENE2", None), ("GENE3", None)}


def test_lethal_term_flags_golden(spark, spn, idmap):
    # F5 analog: phenotype report rows, MP terms; MP:LETHAL in the lethal
    # list. GENE1 has both lethal and non-lethal annotations -> flags
    # 'n|y' (sorted unique) -> 'lethal'
    phen = spark.createDataFrame(
        [("MGI:1", "MP:LETHAL"), ("MGI:1", "MP:OTHER"), ("MGI:4", "MP:OTHER")],
        ["mgi_id", "mp_term"],
    )
    rows = {(r["hgnc_gene_symbol"], r["mgi_viability"])
            for r in gp.lethal_term_flags(phen, ["MP:LETHAL"], spn, idmap).collect()}
    assert rows == {("GENE1", "lethal"), ("GENE2", None), ("GENE3", "viable")}

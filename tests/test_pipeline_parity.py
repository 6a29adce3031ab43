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


@pytest.fixture(scope="module")
def pcg(spark):
    # protein.coding.genes analog for the position/STRING/GO flows
    return spark.createDataFrame(
        [
            ("GENE1", "HGNC:1", "ENSG1", 11),
            ("GENE2", "HGNC:2", "ENSG2", 22),
            ("GENE3", "HGNC:3", "ENSG3", 33),
        ],
        ["symbol", "hgnc_id", "ensembl_gene_id", "entrez_id"],
    )


@pytest.fixture(scope="module")
def pcg_spine(pcg):
    return gp.gene_spine(pcg)


def test_gene_position_length_golden(spark, pcg, pcg_spine):
    pos = spark.createDataFrame(
        [
            # kept: canonical chromosome, known ensembl id
            ("GENE1", "ENSG1", "7", 100, 399, 50.0),
            # dropped: stale ensembl id (not in latest set)
            ("GENE2", "ENSGX", "1", 10, 20, 40.0),
            # dropped: scaffold chromosome
            ("GENE3", "ENSG3", "GL000009.2", 5, 15, 41.0),
        ],
        ["hgnc_symbol", "ensembl_gene_id", "chromosome_name",
         "start_position", "end_position", "percentage_gene_gc_content"],
    )
    out = gp.gene_position_length(pos, pcg, pcg_spine)
    rows = {r["hgnc_gene_symbol"]: (r["chromosome_name"], r["gene_length"])
            for r in out.collect()}
    # spine preserved; only GENE1 carries data (length = 399-100+1)
    assert rows == {
        "GENE1": ("7", 300),
        "GENE2": (None, None),
        "GENE3": (None, None),
    }


def test_string_ppi_golden(spark, pcg, pcg_spine):
    string_map = spark.createDataFrame(
        [("ENSG1", "9606.P1"), ("ENSG2", "9606.P2")],
        ["ensembl_gene_id", "STRING_id"],
    )
    interactions = spark.createDataFrame(
        [("9606.P1", "9606.P2", 900), ("9606.P1", "9606.PX", 800)],
        ["from", "to", "combined_score"],
    )
    out = gp.string_ppi(interactions, pcg, string_map, pcg_spine)
    rows = {
        (r["hgnc_gene_symbol"], r["string_id"], r["Interaction_string_id"],
         r["Interaction_hgnc_gene_symbol"], r["combined_score"])
        for r in out.collect()
    }
    # only the P1->P2 edge survives the second hop (PX unmapped); score
    # scaled to [0,1]; prefixes stripped; GENE3 NULL-padded by the spine
    assert ("GENE1", "P1", "P2", "GENE2", 0.9) in rows
    assert ("GENE3", None, None, None, None) in rows
    assert not any(r[2] == "PX" or (r[4] or 0) > 1 for r in rows)


def test_go_ontology_golden(spark, pcg, pcg_spine):
    go_raw = spark.createDataFrame(
        [
            (11, "GO:1", "thing one", "BP"),
            (11, "GO:2", "thing two", "MF"),
            (22, "GO:3", "thing three", "BP"),
        ],
        ["gene_id", "go_id", "go_term", "Ontology"],
    )
    bp = gp.go_ontology(go_raw, pcg, "BP", pcg_spine)
    assert sorted(bp.columns) == ["go_id_BP", "go_term_BP", "hgnc_gene_symbol"]
    rows = {(r["hgnc_gene_symbol"], r["go_id_BP"]) for r in bp.collect()}
    assert rows == {("GENE1", "GO:1"), ("GENE2", "GO:3"), ("GENE3", None)}
    mf = gp.go_ontology(go_raw, pcg, "MF", pcg_spine)
    rows_mf = {(r["hgnc_gene_symbol"], r["go_id_MF"]) for r in mf.collect()}
    assert rows_mf == {("GENE1", "GO:2"), ("GENE2", None), ("GENE3", None)}


def test_omim_lethality_golden(spark, pcg_spine):
    lethal = spark.createDataFrame(
        [
            ("GENE1", "lethal", "L1"),
            ("GENE2", "-", "NL"),
            ("GENE3", "nonlethal", "-"),
        ],
        ["gene_symbol", "gene_lethal_summary", "earliest_lethality_category"],
    )
    out = gp.omim_lethality(lethal, pcg_spine)
    rows = {r["hgnc_gene_symbol"]:
            (r["gene_lethal_summary"], r["earliest_lethality_category"])
            for r in out.collect()}
    assert rows == {
        "GENE1": ("lethal", "L1; Prenatal death"),
        "GENE2": (None, "NL; Non lethal"),
        "GENE3": ("nonlethal", None),
    }


# ---------------------------------------------------------------------------
# EP2/EP3 completion: the remaining annotation tables
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def genes_full(spark):
    # genes fixture extended with the id / uniprot / group columns the
    # remaining tables consume (F1 analog, wider)
    return spark.createDataFrame(
        [
            ("GENE1", "HGNC:1", 101, "ENSG1", "U1|U2", "GroupA|GroupB"),
            ("GENE2", "HGNC:2", 102, "ENSG2", "", "GroupA"),
            ("GENE3", "HGNC:3", None, "ENSG3", "U9", ""),
            (None, "HGNC:9", 999, "ENSGX", "U0", "Ghost"),
        ],
        ["symbol", "hgnc_id", "entrez_id", "ensembl_gene_id",
         "uniprot_ids", "gene_group"],
    )


@pytest.fixture(scope="module")
def spn_full(genes_full):
    return gp.gene_spine(genes_full)


def test_gene_ids_golden(genes_full, spn_full):
    rows = {
        (r["hgnc_gene_symbol"], r["hgnc_id"], r["entrez_id"], r["ensembl_gene_id"])
        for r in gp.gene_ids(genes_full, spn_full).collect()
    }
    # entrez stringified; NULL entrez survives; ghost row excluded by spine
    assert rows == {
        ("GENE1", "HGNC:1", "101", "ENSG1"),
        ("GENE2", "HGNC:2", "102", "ENSG2"),
        ("GENE3", "HGNC:3", None, "ENSG3"),
    }


def test_gene_groups_golden(genes_full, spn_full):
    rows = {
        (r["hgnc_gene_symbol"], r["gene_group"])
        for r in gp.gene_groups(genes_full, spn_full).collect()
    }
    assert rows == {
        ("GENE1", "GroupA"), ("GENE1", "GroupB"),
        ("GENE2", "GroupA"), ("GENE3", None),
    }


def test_gene_gc_content_golden(spark, genes_full, spn_full):
    pos = spark.createDataFrame(
        [
            ("GENE1", "ENSG1", 41.2),
            ("GENE2", "ENSGSTALE", 50.0),   # stale ensembl id -> semi-join drop
            ("GENE3", "ENSG3", None),       # missing GC -> filtered
        ],
        ["hgnc_symbol", "ensembl_gene_id", "percentage_gene_gc_content"],
    )
    rows = {
        (r["hgnc_gene_symbol"], r["percentage_gene_gc_content"])
        for r in gp.gene_gc_content(pos, genes_full, spn_full).collect()
    }
    assert rows == {("GENE1", 41.2), ("GENE2", None), ("GENE3", None)}


def test_pantherdb_unequal_key_join_golden(spark, genes_full, spn_full):
    panther = spark.createDataFrame(
        [("U1", "kinase"), ("U9", "phosphatase"), ("U0", "ghost-class")],
        ["UNIPROT", "protein_class"],
    )
    rows = {
        (r["hgnc_gene_symbol"], r["uniprot_ids"], r["protein_class"])
        for r in gp.pantherdb(panther, genes_full, spn_full).collect()
    }
    # U2 has no PANTHER row -> NULL class kept (left join); GENE2 has no
    # uniprot -> spine NULL padding
    assert rows == {
        ("GENE1", "U1", "kinase"),
        ("GENE1", "U2", None),
        ("GENE3", "U9", "phosphatase"),
        ("GENE2", None, None),
    }


def test_impc_phenotypes_prededup_golden(spark, genes_full, spn_full):
    phenos = spark.createDataFrame(
        [
            ("MGI:1", "lethality", "extra1"),
            ("MGI:1", "lethality", "extra2"),  # dup after projection (T:236)
            ("MGI:2", "tremor", "x"),
        ],
        ["mgi_id", "mp_term_name", "noise"],
    )
    idmap = spark.createDataFrame(
        [("GENE1", "MGI:1"), ("GENE2", "MGI:2")],
        ["hgnc_gene_symbol", "mgi_id"],
    )
    rows = {
        (r["hgnc_gene_symbol"], r["mp_term_name"])
        for r in gp.impc_phenotypes(phenos, idmap, spn_full).collect()
    }
    assert rows == {
        ("GENE1", "lethality"), ("GENE2", "tremor"), ("GENE3", None),
    }


def test_reactome_species_filter_golden(spark, genes_full, spn_full):
    raw = spark.createDataFrame(
        [
            (101, "R-HSA-1", "Homo sapiens: Signal Transduction"),
            (101, "R-MMU-2", "Mus musculus: Other"),
            (102, "R-HSA-3", "Homo sapiens: Metabolism"),
        ],
        ["entrez_id", "path_id", "path_name"],
    )
    rows = {
        (r["hgnc_gene_symbol"], r["path_id"], r["path_name"])
        for r in gp.reactome(raw, genes_full, spn_full).collect()
    }
    assert rows == {
        ("GENE1", "R-HSA-1", "Signal Transduction"),
        ("GENE2", "R-HSA-3", "Metabolism"),
        ("GENE3", None, None),
    }


def test_orthologs_support_filter_golden(spark, spn_full):
    raw = spark.createDataFrame(
        [
            ("GENE1", "Gene1m", "9"),
            ("GENE2", "Gene2m", "3"),
            ("NOTSPINE", "Gx", "9"),
        ],
        ["human_symbol", "mouse_symbol", "support"],
    )
    rows = {
        (r["hgnc_gene_symbol"], r["mouse_symbol"], r["support"])
        for r in gp.orthologs(raw, spn_full, support_min=5).collect()
    }
    assert rows == {
        ("GENE1", "Gene1m", 9),
        ("GENE2", None, None),   # filtered out -> spine NULL padding
        ("GENE3", None, None),
    }


def test_paralogs_semi_join_golden(spark, genes_full, spn_full):
    raw = spark.createDataFrame(
        [
            ("GENE1", "ENSG2", "GENE2"),
            ("GENE1", "ENSGDEAD", "RETIRED"),  # paralog id not protein-coding
            ("GENE3", "ENSG1", "GENE1"),
        ],
        ["hgnc_symbol", "paralog_ensembl_gene_id", "paralog_associated_gene_name"],
    )
    rows = {
        (r["hgnc_gene_symbol"], r["paralog_associated_gene_name"])
        for r in gp.paralogs(raw, genes_full, spn_full).collect()
    }
    assert rows == {
        ("GENE1", "GENE2"), ("GENE3", "GENE1"), ("GENE2", None),
    }


# ---------------------------------------------------------------------------
# EP3 — TM manuscript-file score tables (temp-tidy-all-manuscript-files.R)
# ---------------------------------------------------------------------------


def test_alphamissense_flag_golden(spark, pcg):
    # TM:6-30 — version-suffix strip, MANE/canonical natural join, four-way
    # flag case_when with R NA-condition fallthrough, hgnc_symbol filter
    alpham = spark.createDataFrame(
        [("ENST1.5", 0.9), ("ENST2.12", 0.5), ("ENST3.1", 0.2),
         ("ENST4.2", 0.1), ("ENST9.9", 0.7)],
        ["transcript_id", "am_score"],
    )
    mane = spark.createDataFrame(
        [("GENE1", "ENST1", "MANE1", None),      # mane only
         ("GENE2", "ENST2", "", 1),              # canonical only
         ("GENE3", "ENST3", "MANE3", 1),         # mane and canonical
         ("GENE1", "ENST4", "", None),           # neither
         ("NOTPCG", "ENST9", "MANE9", 1)],       # dropped by the S12 filter
        "hgnc_symbol string, ensembl_transcript_id string, "
        "transcript_mane_select string, transcript_is_canonical int",
    )
    rows = {
        (r["ensembl_transcript_id"], r["hgnc_symbol"], r["flag"])
        for r in gp.alphamissense(alpham, mane, pcg).collect()
    }
    assert rows == {
        ("ENST1", "GENE1", "mane only"),
        ("ENST2", "GENE2", "canonical only"),
        ("ENST3", "GENE3", "mane and canonical"),
        ("ENST4", "GENE1", "neither"),
        # ENST9: mane row excluded by the protein-coding semi join ->
        # left-join miss -> hgnc_symbol NULL -> filtered (TM:30)
    }


def test_scones_positional_golden(spark, pcg):
    # TM:42-48 — df[, c(1,17,19)] positional slice then %in% filter
    names = ["Gene"] + [f"c{i}" for i in range(2, 17)] + ["SCoNeS", "c18", "DOMINO"]
    row1 = ["GENE1"] + [0.0] * 15 + [0.8, 0.0, 0.3]
    row2 = ["NOTPCG"] + [0.0] * 15 + [0.5, 0.0, 0.1]
    raw = spark.createDataFrame([tuple(row1), tuple(row2)], names)
    out = gp.scones(raw, pcg)
    assert out.columns == ["gene_symbol", "scones"]
    assert {(r[0], r[1]) for r in out.collect()} == {("GENE1", 0.8)}


def test_domino_dedup_golden(spark):
    # TM:50-57 — the count→filter-dups flow drops both HGNC:2 rows
    raw = spark.createDataFrame(
        [("HGNC:1", 0.9), ("HGNC:2", 0.5), ("HGNC:2", 0.6), ("HGNC:3", 0.7)],
        ["#HGNC ID", "Score"],
    )
    rows = {tuple(r) for r in gp.domino(raw).collect()}
    assert rows == {("HGNC:1", 0.9), ("HGNC:3", 0.7)}


def test_gismo_full_join_golden(spark, pcg):
    # TM:59-77 — mapping join, full join, pcg filter, round-3, dedup
    gismo_raw = spark.createDataFrame(
        [(0.12341, 1, "ENSG1"),     # GENE1, gismo side only
         (0.5, 2, "ENSGX"),         # unmapped -> gene_symbol NULL -> dropped
         (0.1, 1, "ENSG3"),         # GENE3 dup #1
         (0.2, 2, "ENSG3")],        # GENE3 dup #2 -> keep_unique drops both
        ["median", "decile", "gene"],
    )
    gismo_mis_raw = spark.createDataFrame(
        [(0.98761, "GENE2", 9, "ENST2")],   # GENE2, mis side only
        ["mean.comb", "genename", "dec", "gene"],
    )
    out = gp.gismo(gismo_raw, gismo_mis_raw, pcg)
    assert out.columns == ["gene_symbol", "gismo_median", "gismo_decile",
                           "gismo_mis_mean_comb", "gismo_mis_decile"]
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        ("GENE1", 0.123, 1, None, None),
        ("GENE2", None, None, 0.988, 9),
    }


def test_shet_posterior_golden(spark):
    # TM:79-89 — positional 1/2/7/8/9, bulk rename, round-3, 2-col slice
    names = ["ens", "hgnc", "c3", "c4", "c5", "c6", "mean", "lower", "upper"]
    raw = spark.createDataFrame(
        [("ENSG1", "HGNC:1", 0, 0, 0, 0, 0.5561, 0.1, 0.9),
         ("ENSG1", "HGNC:1", 0, 0, 0, 0, 0.5561, 0.1, 0.9)],  # exact dup
        names,
    )
    out = gp.shet_posterior(raw)
    assert out.columns == ["hgnc_id", "shet_post_mean"]
    assert {tuple(r) for r in out.collect()} == {("HGNC:1", 0.556)}


def test_mair_fitness_golden(spark):
    # TM:93-102 — positional 1/2/7 rename + FDR round-3, per condition
    names = ["g", "bf", "c3", "c4", "c5", "c6", "fdr"]
    raw = spark.createDataFrame([("GENE1", 12.3, 0, 0, 0, 0, 0.0012)], names)
    out = gp.mair_fitness(raw, "mef")
    assert out.columns == ["gene_symbol", "bf_mef", "fdr_mef"]
    assert {tuple(r) for r in out.collect()} == {("GENE1", 12.3, 0.001)}


def test_rosen_score_golden(spark):
    # TM:104-127 — select(X1, 11), promote first row to header, round-2,
    # positional rename of the score column
    names = ["X1"] + [f"X{i}" for i in range(2, 12)]
    rows = [tuple(["gene"] + [""] * 9 + ["NE_pluripotency_score"]),
            tuple(["GENE1"] + [""] * 9 + ["0.456"]),
            tuple(["GENE2"] + [""] * 9 + ["1.234"])]
    raw = spark.createDataFrame(rows, names)
    out = gp.rosen_score(raw)
    assert out.columns == ["gene", "NE_pluripotency_score"]
    assert {tuple(r) for r in out.collect()} == {("GENE1", 0.46), ("GENE2", 1.23)}

    renamed = gp.rosen_score(raw, rename_to="E8_self_renewal_score")
    assert renamed.columns == ["gene", "E8_self_renewal_score"]


# ---------------------------------------------------------------------------
# TW — web-file end-to-end builders (temp-tidy-all-web-files.R)
# ---------------------------------------------------------------------------


def test_depmap_essentiality_golden(spark, pcg, pcg_spine):
    # TW:12-51 — melt, -0.5 binarize, rowSums pct + rowMeans in one agg,
    # spine join. 3 models x 2 genes; GENE1 essential in 2/3 models.
    gene_effect = spark.createDataFrame(
        [("M1", -0.9, 0.1), ("M2", -0.6, -0.2), ("M3", 0.0, 0.3)],
        ["...1", "GENE1 (101)", "GENE2 (102)"],
    )
    rows = {
        (r["hgnc_gene_symbol"], r["percentage_essential"], r["mean_score_all"])
        for r in gp.depmap_essentiality(gene_effect, pcg_spine).collect()
    }
    assert rows == {
        ("GENE1", 66.667, -0.5),   # 2/3 essential; mean(-0.9,-0.6,0.0)
        ("GENE2", 0.0, 0.067),     # none essential; mean(0.1,-0.2,0.3)
        ("GENE3", None, None),     # spine NULL padding
    }


def test_gtex_expression_golden(spark, pcg, pcg_spine):
    # TW:58-71 — PAR_Y drop, version strip, pcg semi join, symbol attach,
    # round-3 of numeric tissue columns
    gtex = spark.createDataFrame(
        [("ENSG1.14", "g one", 1.23456, 7.0),
         ("ENSG2_PAR_Y.3", "par y", 9.9, 9.9),     # dropped (TW:61)
         ("ENSGDEAD.2", "retired", 1.0, 1.0)],     # not protein-coding
        ["Name", "Description", "Liver", "Brain"],
    )
    out = gp.gtex_expression(gtex, pcg, pcg_spine)
    assert out.columns == ["hgnc_gene_symbol", "Liver", "Brain"]
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        ("GENE1", 1.235, 7.0),
        ("GENE2", None, None),
        ("GENE3", None, None),
    }


def test_constraint_scores_golden(spark, pcg_spine):
    # TW:143-168 — MANE/canonical transcript gate then prefer-flagged
    gnomad = spark.createDataFrame(
        [
            ("GENE1", "ENST1", "true", 0.11, 0.5, ""),    # mane transcript
            ("GENE1", "ENST1B", "", 0.99, 0.5, ""),       # canonical dup -> dropped by prefer-flagged
            ("GENE2", "ENST2", "", 0.22, 0.5, ""),        # canonical only, singleton
            ("GENE3", "ENSTX", "", 0.33, 0.5, ""),        # transcript not mane/canonical -> gated out
        ],
        ["gene", "transcript", "mane_select", "lof.oe_ci.upper",
         "mis.oe_ci.upper", "constraint_flags"],
    )
    mane = spark.createDataFrame(
        [("GENE1", "ENST1", "MANE1", None),
         ("GENE1", "ENST1B", "", 1),
         ("GENE2", "ENST2", "", 1)],
        "hgnc_symbol string, ensembl_transcript_id string, "
        "transcript_mane_select string, transcript_is_canonical int",
    )
    out = gp.constraint_scores(gnomad, mane, pcg_spine)
    assert out.columns == ["hgnc_gene_symbol", "LOEUF"]
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        ("GENE1", 0.11),   # dup resolved to the mane_select == "true" row
        ("GENE2", 0.22),
        ("GENE3", None),   # gated out -> spine NULL padding
    }


# ---------------------------------------------------------------------------
# TW — remaining web-file tables (HPA / OGEE / dbNSFP / WoL / GWAS)
# ---------------------------------------------------------------------------


def test_hpa_bulk_expression_golden(spark, pcg_spine):
    hpa = spark.createDataFrame(
        [("ENSG1", "GENE1", "Approved", 1.5),
         ("ENSG2", "GENE2", "Uncertain", 9.9)],   # dropped (TW:75)
        ["Gene", "Gene name", "Reliability", "Liver"],
    )
    out = gp.hpa_bulk_expression(hpa, pcg_spine)
    assert out.columns == ["hgnc_gene_symbol", "Liver"]
    assert {tuple(r) for r in out.collect()} == {
        ("GENE1", 1.5), ("GENE2", None), ("GENE3", None),
    }


def test_lymphoblastoid_expression_golden(spark, pcg_spine):
    lts = spark.createDataFrame(
        [("ENSG1", "GENE1", 3.0, 4.0)],
        ["Gene ID", "Gene Name", "heart_wk4", "liver_wk4"],
    )
    out = gp.lymphoblastoid_expression(lts, pcg_spine)
    assert out.columns == ["hgnc_gene_symbol", "heart_wk4", "liver_wk4"]
    rows = {tuple(r) for r in out.collect()}
    assert ("GENE1", 3.0, 4.0) in rows and ("GENE2", None, None) in rows


def test_hpa_subcellular_and_classes_golden(spark, pcg_spine):
    atlas = spark.createDataFrame(
        [("GENE1", "Nucleoplasm,Cytosol", "Enzymes, Transporters"),
         ("GENE2", None, "Predicted membrane proteins")],
        ["Gene", "Subcellular location", "Protein class"],
    )
    loc = {(r["hgnc_gene_symbol"], r["Subcellular location"])
           for r in gp.hpa_subcellular_location(atlas, pcg_spine).collect()}
    # GENE1 explodes; GENE2's NULL location row is dropped then NULL-padded
    assert loc == {("GENE1", "Nucleoplasm"), ("GENE1", "Cytosol"),
                   ("GENE2", None), ("GENE3", None)}
    cls = {(r["hgnc_gene_symbol"], r["Protein class"])
           for r in gp.hpa_protein_classes(atlas, pcg_spine).collect()}
    # trimmed after the comma split (TW:111)
    assert cls == {("GENE1", "Enzymes"), ("GENE1", "Transporters"),
                   ("GENE2", "Predicted membrane proteins"), ("GENE3", None)}


def test_ogee_connectivity_golden(spark, pcg, pcg_spine):
    ppi = spark.createDataFrame(
        [("GENE1", 0.9, 12, 99.0), ("NOTPCG", 0.1, 1, 5.0)],
        ["gene", "score", "connectivity", "percentile"],
    )
    out = gp.ogee_connectivity(ppi, pcg, pcg_spine)
    rows = {tuple(r) for r in out.collect()}
    assert ("GENE1", 0.9, 12, 99.0) in rows
    assert ("GENE2", None, None, None) in rows


def test_dbnsfp_hi_and_gwas_golden(spark, pcg_spine):
    dbnsfp = spark.createDataFrame(
        [("GENE1", "3", "Height[PMID123]; Weight ; ."),
         ("GENE2", ".", "[only citation]"),
         ("GENE3", "1", None)],
        ["Gene_name", "ClinGen_Haploinsufficiency_Score",
         "Trait_association(GWAS)"],
    )
    hi = {(r["hgnc_gene_symbol"], r["ClinGen_Haploinsufficiency_Score"])
          for r in gp.dbnsfp_haploinsufficiency(dbnsfp, pcg_spine).collect()}
    # GENE2's '.' sentinel row dropped (TW:133) -> spine NULL padding
    assert hi == {("GENE1", "3"), ("GENE2", None), ("GENE3", "1")}

    gw = {(r["hgnc_gene_symbol"], r["GWAS_trait"])
          for r in gp.dbnsfp_gwas_traits(dbnsfp, pcg_spine).collect()}
    # bracket strip, ';' explode, trim, '' and '.' dropped (TW:199-208)
    assert gw == {("GENE1", "Height"), ("GENE1", "Weight"),
                  ("GENE2", None), ("GENE3", None)}


def test_impc_window_of_lethality_golden(spark, pcg_spine):
    wol = spark.createDataFrame(
        [("GENE1", "early"), ("GENE1", "early"), ("GENE9", "late")],
        ["hs_gene_symbol", "wol"],
    )
    out = {(r["hgnc_gene_symbol"], r["wol"])
           for r in gp.impc_window_of_lethality(wol, pcg_spine).collect()}
    # dup collapsed by distinct; GENE9 not on the spine -> absent
    assert out == {("GENE1", "early"), ("GENE2", None), ("GENE3", None)}

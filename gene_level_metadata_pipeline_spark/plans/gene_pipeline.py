"""Reference pipeline parity: the EP2/EP3 tidy flow as engine programs.

Recomposes the reference's harmonization stage (SURVEY.md §3) from engine
operators, one function per annotation table, mirroring the cited tidy
scripts step-for-step — but lazy, distributed, and without the R global
environment (tables flow through an explicit Catalog).

Each builder takes the raw source frames and returns the harmonized
gene-level table; tests/test_pipeline_parity.py runs them on
reference-shaped fixtures (FIXTURES.md F1/F4/F5 analogs) against golden
outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.functions.scalars import (
    flag_in,
    nullify,
    round_r,
    sentence_case,
    strip_version_suffix,
)
from gene_level_metadata_pipeline_spark.operators.conflicts import (
    keep_unique,
    null_conflicts,
    prefer_flagged,
)
from gene_level_metadata_pipeline_spark.operators.harmonize import harmonize, spine
from gene_level_metadata_pipeline_spark.operators.reshape import separate_rows

KEY = "hgnc_gene_symbol"

__all__ = [
    "gene_spine",
    "prev_names",
    "gene_names",
    "symbol_id_mappings",
    "viability",
    "lethal_term_flags",
    "gene_position_length",
    "string_ppi",
    "go_ontology",
    "omim_lethality",
    "gene_ids",
    "gene_groups",
    "gene_gc_content",
    "pantherdb",
    "impc_phenotypes",
    "reactome",
    "orthologs",
    "paralogs",
    "alphamissense",
    "scones",
    "domino",
    "gismo",
    "shet_posterior",
    "mair_fitness",
    "rosen_score",
    "depmap_essentiality",
    "gtex_expression",
    "constraint_scores",
    "hpa_bulk_expression",
    "lymphoblastoid_expression",
    "hpa_subcellular_location",
    "hpa_protein_classes",
    "ogee_connectivity",
    "dbnsfp_haploinsufficiency",
    "impc_window_of_lethality",
    "dbnsfp_gwas_traits",
]


def gene_spine(genes: DataFrame, symbol_col: str = "symbol") -> DataFrame:
    """U1: the canonical spine (utils/hgnc_symbol_template_func.R:3-10) —
    select symbol → drop NULL → distinct → rename to hgnc_gene_symbol."""
    return spine(genes, symbol_col).withColumnRenamed(symbol_col, KEY)


def prev_names(genes: DataFrame, spn: DataFrame) -> DataFrame:
    """T:24-32 (prev_symbol table): select → ''→NULL → explode on '|' →
    drop empty → spine join + distinct. alias_names (T:35-43) is the same
    program on alias_symbol."""
    src = (
        nullify(genes.select(F.col("symbol").alias(KEY), "prev_symbol"), "")
        .transform(lambda d: separate_rows(d, "prev_symbol", r"\|"))
        .where(F.col("prev_symbol").isNull() | (F.col("prev_symbol") != ""))
    )
    return harmonize(spn, src, KEY)


def gene_names(genes: DataFrame, spn: DataFrame) -> DataFrame:
    """T:130-137 (gene_names): ''→NULL then sentence-case the free-text
    name, spine join."""
    src = nullify(genes.select(F.col("symbol").alias(KEY), "name"), "").select(
        KEY, sentence_case("name").alias("gene_name")
    )
    return harmonize(spn, src, KEY)


def symbol_id_mappings(genes: DataFrame, spn: DataFrame, id_col: str) -> DataFrame:
    """T:45-54 / T:57-66 (mgd_id / uniprot_ids mapping tables): pipe-packed
    multi-ID column → explode → spine join."""
    src = nullify(genes.select(F.col("symbol").alias(KEY), id_col), "")
    src = separate_rows(src, id_col, r"\|")
    return harmonize(spn, src, KEY)


def viability(
    mouse: DataFrame,
    idmap: DataFrame,
    spn: DataFrame,
    mode: str = "keep_unique",
) -> DataFrame:
    """T:196-225 (IMPC viability) / T:266-277 (MGI viability).

    mouse: (mgi_id, viability[, comment]); idmap: (hgnc_gene_symbol,
    mgi_id) from the exploded mgd_id mapping. Clean → join to human
    symbols → resolve one-to-many conflicts:
      * 'keep_unique'   — drop ambiguous symbols entirely (T:213-219)
      * 'null_conflicts'— keep the symbol, null its payload (T:273-277)
    then spine join.
    """
    cleaned = mouse
    if "comment" in mouse.columns:
        cleaned = cleaned.where(
            F.col("comment").isNull() | (F.col("comment") == "")
        ).drop("comment")
    if mode not in ("keep_unique", "null_conflicts"):
        raise ValueError(
            f"viability: unknown conflict mode {mode!r} "
            "(expected 'keep_unique' or 'null_conflicts')"
        )
    mapped = idmap.join(cleaned, "mgi_id").select(KEY, "viability").dropDuplicates()
    resolved = (
        keep_unique(mapped, KEY) if mode == "keep_unique"
        else null_conflicts(mapped, KEY)
    )
    return harmonize(spn, resolved, KEY)


def lethal_term_flags(
    phenotypes: DataFrame, lethal_terms: list[str], spn: DataFrame, idmap: DataFrame
) -> DataFrame:
    """T:246-263 (MGI lethality): headerless phenotype report (mgi_id,
    mp_term) → per-gene ordered '|'-joined flag list over %in% lethal
    terms → viable/lethal recode → spine join.

    array_sort(collect_set) reproduces the reference's
    arrange → unique → paste(collapse='|') deterministically (A6).
    """
    flagged = phenotypes.select(
        "mgi_id", flag_in("mp_term", lethal_terms).alias("is_lethal")
    )
    per_gene = flagged.groupBy("mgi_id").agg(
        F.concat_ws("|", F.array_sort(F.collect_set("is_lethal"))).alias("flags")
    )
    labeled = per_gene.select(
        "mgi_id",
        F.when(F.col("flags").contains("y"), "lethal").otherwise("viable").alias(
            "mgi_viability"
        ),
    )
    mapped = idmap.join(labeled, "mgi_id").select(KEY, "mgi_viability").dropDuplicates()
    return harmonize(spn, mapped, KEY)


CHROMOSOMES = [str(i) for i in range(1, 23)] + ["X", "Y"]

OMIM_LETHALITY_LABELS = {
    "L1": "L1; Prenatal death",
    "L2": "L2; Neonatal death",
    "L3": "L3; Death in infancy",
    "L4": "L4; Death in childhood",
    "L5": "L5; Death in adolescence",
    "L6": "L6; Death in adulthood",
    "LU": "LU; Not determined",
    "NL": "NL; Non lethal",
}


def gene_position_length(pos: DataFrame, genes: DataFrame, spn: DataFrame) -> DataFrame:
    """T:91-108 (gene_position_length): derive gene_length = end − start
    + 1, drop GC%, rename to the spine key, keep only rows whose ensembl
    id is in the latest protein-coding set (the reference pulls a driver
    vector + %in%, T:93/T:98 — here a distributed semi join), filter to
    canonical chromosomes (T:92/T:100) and non-missing coordinates, then
    spine join."""
    from gene_level_metadata_pipeline_spark.operators.joins import semi_join

    src = (
        pos.withColumn(
            "gene_length",
            F.col("end_position") - F.col("start_position") + F.lit(1),
        )
        .drop("percentage_gene_gc_content")
        .withColumnRenamed("hgnc_symbol", KEY)
    )
    src = semi_join(src, genes.select("ensembl_gene_id"), "ensembl_gene_id")
    src = (
        src.where(F.col("chromosome_name").isNotNull())
        .where(F.col("chromosome_name") != "")
        .where(F.col("chromosome_name").isin(CHROMOSOMES))
        .where(F.col("start_position").isNotNull())
        .where(F.col("end_position").isNotNull())
        .where(F.col("gene_length").isNotNull())
        .dropDuplicates()
    )
    return harmonize(spn, src, KEY)


def string_ppi(
    interactions: DataFrame,
    genes: DataFrame,
    string_map: DataFrame,
    spn: DataFrame,
) -> DataFrame:
    """T:139-191 (STRING_ppi): the two-hop M:N edge decoration.

    ``string_map`` is the STRINGdb id-mapping table (ensembl_gene_id →
    STRING_id); mapping with removeUnmappedRows=TRUE (I:72) is an inner
    join. Hop 1 decorates the edge source (join_by STRING_id == from,
    T:148-153); hop 2 decorates the target (STRING_id ==
    protein2_string_id, T:157-163); both endpoints then strip the
    ^9606. prefix (T:175-176), gain gene symbols via the hgnc_id
    mapping tables (T:165-172, natural joins), drop edgeless genes and
    scale the score to [0,1] (T:180-181).

    Scale plan: the interactions edge list is the only big side — the
    ID map and symbol dimensions (~20k genes) are broadcast explicitly,
    so the edges never shuffle onto dimension keys. The hops are written
    as left joins for reference parity, but the trailing null-rejecting
    score filter lets Catalyst rewrite them to inner joins, where the
    broadcast hint on the dimension side binds."""
    mapped = F.broadcast(
        genes.select("hgnc_id", "ensembl_gene_id")
        .join(string_map, "ensembl_gene_id", "inner")
        .select("hgnc_id", "STRING_id")
    )
    hop1 = (
        mapped.join(
            interactions, mapped.STRING_id == interactions["from"], "left"
        )
        .select(
            F.col("hgnc_id").alias("protein1_hgnc_id"),
            F.col("STRING_id").alias("protein1_string_id"),
            F.col("to").alias("protein2_string_id"),
            "combined_score",
        )
    )
    hop2 = (
        mapped.join(hop1, mapped.STRING_id == hop1.protein2_string_id, "left")
        .select(
            "protein1_hgnc_id",
            "protein1_string_id",
            F.col("hgnc_id").alias("protein2_hgnc_id"),
            F.col("STRING_id").alias("protein2_string_id"),
            "combined_score",
        )
    )
    sym1 = genes.select(
        F.col("symbol").alias("gene_symbol"),
        F.col("hgnc_id").alias("protein1_hgnc_id"),
    )
    sym2 = genes.select(
        F.col("symbol").alias("protein2_gene_symbol"),
        F.col("hgnc_id").alias("protein2_hgnc_id"),
    )
    out = (
        hop2.withColumn(
            "protein1_string_id",
            F.regexp_replace("protein1_string_id", r"^9606\.", ""),
        )
        .withColumn(
            "protein2_string_id",
            F.regexp_replace("protein2_string_id", r"^9606\.", ""),
        )
        .join(F.broadcast(sym1), "protein1_hgnc_id", "left")
        .join(F.broadcast(sym2), "protein2_hgnc_id", "left")
        .where(F.col("combined_score").isNotNull())
        .withColumn("combined_score", F.col("combined_score") / 1000)
        .select(
            F.col("gene_symbol").alias(KEY),
            F.col("protein1_string_id").alias("string_id"),
            F.col("protein2_string_id").alias("Interaction_string_id"),
            F.col("protein2_gene_symbol").alias("Interaction_hgnc_gene_symbol"),
            "combined_score",
        )
    )
    return harmonize(spn, out, KEY, broadcast_source=False)


def go_ontology(
    go_raw: DataFrame, genes: DataFrame, ontology: str, spn: DataFrame
) -> DataFrame:
    """T:282-329 (GO_BP / GO_MF / GO_CC): entrez→symbol mapping join
    (entrez cast to string for join safety, T:285), single-ontology
    filter, then the degenerate pivot_wider+unnest whose net effect is
    the per-ontology column rename (SURVEY R2) — go_id → go_id_BP etc."""
    mapping = genes.select(
        F.col("symbol").alias("gene_symbol"),
        F.col("entrez_id").cast("string").alias("entrez_id"),
    )
    src = (
        go_raw.withColumnRenamed("gene_id", "entrez_id")
        .withColumn("entrez_id", F.col("entrez_id").cast("string"))
        .join(mapping, "entrez_id", "left")
        .where(F.col("Ontology") == ontology)
        .withColumnRenamed("go_id", f"go_id_{ontology}")
        .withColumnRenamed("go_term", f"go_term_{ontology}")
        .drop("entrez_id", "Ontology")
        .withColumnRenamed("gene_symbol", KEY)
    )
    return harmonize(spn, src, KEY)


def omim_lethality(lethal: DataFrame, spn: DataFrame) -> DataFrame:
    """T:405-438 (OMIM_lethality_categories): gene-level slice of the
    lethal-phenotypes table with the L1–L6/LU/NL expansion (T:420-431),
    '-' sentinels nulled across all columns (T:433), spine join."""
    from gene_level_metadata_pipeline_spark.functions.scalars import recode

    src = lethal.select(
        "gene_symbol", "gene_lethal_summary", "earliest_lethality_category"
    ).withColumn(
        "earliest_lethality_category",
        recode(
            "earliest_lethality_category",
            OMIM_LETHALITY_LABELS,
            default=F.col("earliest_lethality_category"),
        ),
    )
    for c in src.columns:
        src = src.withColumn(c, F.when(F.col(c) == "-", None).otherwise(F.col(c)))
    return harmonize(spn, src.withColumnRenamed("gene_symbol", KEY), KEY)


def gene_ids(genes: DataFrame, spn: DataFrame) -> DataFrame:
    """T:13-21 (Gene_IDs): the identifier cross-reference table — select
    symbol + id columns, entrez cast to string for join safety (T:16),
    '' → NULL across all columns (T:17), drop empty symbols (T:28 analog),
    spine join + distinct."""
    cols = [c for c in ("hgnc_id", "entrez_id", "ensembl_gene_id") if c in genes.columns]
    src = genes.select(F.col("symbol").alias(KEY), *cols)
    if "entrez_id" in cols:
        src = src.withColumn("entrez_id", F.col("entrez_id").cast("string"))
    src = nullify(src, "")
    return harmonize(spn, src, KEY)


def gene_groups(genes: DataFrame, spn: DataFrame) -> DataFrame:
    """T:78-89 (gene_groups): pipe-packed gene_group families exploded
    one-per-row (R1), '' → NULL, spine join. Same program shape as
    symbol_id_mappings — kept separate because the reference names it as
    its own annotation table."""
    return symbol_id_mappings(genes, spn, "gene_group")


def gene_gc_content(pos: DataFrame, genes: DataFrame, spn: DataFrame) -> DataFrame:
    """T:111-121 (gene_gc_content): GC percentage slice of the biomaRt
    position table — semi join to the latest protein-coding ensembl set
    (T:114 %in% → distributed semi join), drop coordinates, rename to the
    spine key, spine join."""
    from gene_level_metadata_pipeline_spark.operators.joins import semi_join

    src = (
        pos.select(
            F.col("hgnc_symbol").alias(KEY),
            "ensembl_gene_id",
            "percentage_gene_gc_content",
        )
        .where(F.col("percentage_gene_gc_content").isNotNull())
    )
    src = semi_join(src, genes.select("ensembl_gene_id"), "ensembl_gene_id")
    return harmonize(spn, src.drop("ensembl_gene_id").dropDuplicates(), KEY)


def pantherdb(panther: DataFrame, genes: DataFrame, spn: DataFrame) -> DataFrame:
    """T:124-137 (PANTHERdb): protein-class annotations keyed by UniProt
    accession, attached to symbols through the exploded uniprot_ids
    mapping (J3 — the one unequal-key join in the reference,
    by = c('UNIPROT' = 'uniprot_ids'), T:127), then spine join."""
    idmap = separate_rows(
        nullify(genes.select(F.col("symbol").alias(KEY), "uniprot_ids"), ""),
        "uniprot_ids",
        r"\|",
    ).where(F.col("uniprot_ids").isNotNull())
    src = (
        idmap.join(panther, idmap.uniprot_ids == panther.UNIPROT, "left")
        .drop("UNIPROT")
        .dropDuplicates()
    )
    return harmonize(spn, src, KEY)


def impc_phenotypes(phenos: DataFrame, idmap: DataFrame, spn: DataFrame) -> DataFrame:
    """T:228-243 (IMPC_phenotypes): significant mouse phenotype calls —
    project to (mgi_id, phenotype term), pre-dedup BEFORE the join to
    bound fan-out (T:236-237, a semantic dedup Catalyst must not remove),
    map to human symbols, spine join."""
    cleaned = phenos.select("mgi_id", "mp_term_name").dropDuplicates()
    mapped = idmap.join(cleaned, "mgi_id").select(KEY, "mp_term_name").dropDuplicates()
    return harmonize(spn, mapped, KEY)


def reactome(reactome_raw: DataFrame, genes: DataFrame, spn: DataFrame) -> DataFrame:
    """T:332-344 (Reactome): pathway memberships — keep only human
    pathways (grepl 'Homo sapiens:', F7/T:334), strip the species prefix
    (X2/T:335), attach symbols via the entrez mapping (string-cast,
    T:285 analog), spine join."""
    mapping = genes.select(
        F.col("symbol").alias(KEY),
        F.col("entrez_id").cast("string").alias("entrez_id"),
    )
    src = (
        reactome_raw.where(F.col("path_name").contains("Homo sapiens:"))
        .withColumn("path_name", F.regexp_replace("path_name", "Homo sapiens: ", ""))
        .withColumn("entrez_id", F.col("entrez_id").cast("string"))
        .join(mapping, "entrez_id", "left")
        .where(F.col(KEY).isNotNull())
        .drop("entrez_id")
        .dropDuplicates()
    )
    return harmonize(spn, src, KEY)


def orthologs(raw: DataFrame, spn: DataFrame, support_min: int | None = None) -> DataFrame:
    """T:503-515 (Orthologs_human_mouse): the shifted-header TSV repaired
    by headers.fix_shifted_header upstream (P6, T:504-508); here the
    repaired frame is projected to (human symbol, mouse symbol, support
    count), optionally filtered to a minimum support, spine joined."""
    src = raw.select(
        F.col("human_symbol").alias(KEY),
        "mouse_symbol",
        F.col("support").cast("int").alias("support"),
    )
    if support_min is not None:
        src = src.where(F.col("support") >= support_min)
    return harmonize(spn, src.dropDuplicates(), KEY)


def paralogs(raw: DataFrame, genes: DataFrame, spn: DataFrame) -> DataFrame:
    """T:518-531 (Paralogs_human): within-species paralog pairs — keep
    pairs whose paralog ensembl id is still in the protein-coding set
    (semi join replacing the pulled-vector %in%, T:520-524 analog),
    rename to the spine key, spine join."""
    from gene_level_metadata_pipeline_spark.operators.joins import semi_join

    src = raw.select(
        F.col("hgnc_symbol").alias(KEY),
        "paralog_ensembl_gene_id",
        "paralog_associated_gene_name",
    )
    src = semi_join(
        src,
        genes.select(F.col("ensembl_gene_id").alias("paralog_ensembl_gene_id")),
        "paralog_ensembl_gene_id",
    )
    return harmonize(spn, src.dropDuplicates(), KEY)


# ---------------------------------------------------------------------------
# EP3 — manuscript-file score tables (TM: temp-tidy-all-manuscript-files.R)
# ---------------------------------------------------------------------------


def alphamissense(alpham: DataFrame, mane: DataFrame, genes: DataFrame) -> DataFrame:
    """TM:6-40 (AlphaMissense): strip the transcript version suffix
    (TM:8), rename to ensembl_transcript_id (TM:9), attach the MANE/
    canonical flags from the biomaRt snapshot restricted to the
    protein-coding symbols (TM:12-18, S12 → semi join + natural left
    join), derive the four-way MANE/canonical flag (TM:19-29 case_when —
    Spark's null-predicate semantics match R's NA-condition fallthrough
    exactly), drop rows with no hgnc_symbol (TM:30).
    """
    from gene_level_metadata_pipeline_spark.operators.joins import (
        natural_join,
        semi_join,
    )

    src = alpham.withColumn(
        "ensembl_transcript_id", strip_version_suffix("transcript_id")
    ).drop("transcript_id")
    mane_sel = semi_join(
        mane,
        genes.select(F.col("symbol").alias("hgnc_symbol")),
        "hgnc_symbol",
    )
    joined = natural_join(src, mane_sel, "left")
    mane_c, canon = F.col("transcript_mane_select"), F.col("transcript_is_canonical")
    return joined.withColumn(
        "flag",
        F.when((mane_c != "") & canon.isNull(), "mane only")
        .when((canon == 1) & (mane_c == ""), "canonical only")
        .when((mane_c != "") & (canon == 1), "mane and canonical")
        .when((mane_c == "") & canon.isNull(), "neither")
        .otherwise(F.lit(None).cast("string")),
    ).where(F.col("hgnc_symbol").isNotNull())


def scones(raw: DataFrame, genes: DataFrame) -> DataFrame:
    """TM:42-48 (SCoNeS): positional select of columns 1/17/19 (P3),
    rename Gene → gene_symbol, %in% protein-coding filter (semi join),
    rename SCoNeS → scones and drop the DOMINO column."""
    from gene_level_metadata_pipeline_spark.operators.headers import select_positional
    from gene_level_metadata_pipeline_spark.operators.joins import semi_join

    src = select_positional(raw, 1, 17, 19).withColumnRenamed("Gene", "gene_symbol")
    src = semi_join(
        src, genes.select(F.col("symbol").alias("gene_symbol")), "gene_symbol"
    )
    return src.withColumnRenamed("SCoNeS", "scones").drop("DOMINO")


def domino(raw: DataFrame) -> DataFrame:
    """TM:50-57 (DOMINO): project (#HGNC ID, Score) → (hgnc_symbol,
    domino), then drop every symbol that appears more than once — the
    reference's count→filter-dups flow is exactly keep_unique (A2)."""
    src = raw.select(
        F.col("`#HGNC ID`").alias("hgnc_symbol"), F.col("Score").alias("domino")
    )
    return keep_unique(src, "hgnc_symbol")


def gismo(
    gismo_raw: DataFrame, gismo_mis_raw: DataFrame, genes: DataFrame
) -> DataFrame:
    """TM:59-77 (GISMO & GISMO-mis): symbol↔ENSG mapping join for GISMO
    (TM:60-67), column-rename tidy of GISMO-mis (TM:68-72), full natural
    join of the two (TM:73), %in% protein-coding filter, transcript drop,
    half-even round-3 of both scores (TM:75-76 R round), distinct, and
    keep_unique on gene_symbol (TM:77's count→filter-dups)."""
    from gene_level_metadata_pipeline_spark.operators.headers import reorder_first
    from gene_level_metadata_pipeline_spark.operators.joins import (
        full_join,
        natural_join,
        semi_join,
    )

    mapping = genes.select(
        F.col("symbol").alias("gene_symbol"),
        F.col("ensembl_gene_id").alias("gene"),
    )
    g = (
        natural_join(gismo_raw, mapping, "left")
        .select("median", "gene_symbol", "decile")
        .transform(lambda d: reorder_first(d, "gene_symbol"))
        .where(F.col("gene_symbol").isNotNull())
        .withColumnRenamed("median", "gismo_median")
        .withColumnRenamed("decile", "gismo_decile")
    )
    gm = (
        gismo_mis_raw.select("`mean.comb`", "genename", "dec", "gene")
        .withColumnRenamed("genename", "gene_symbol")
        .transform(lambda d: reorder_first(d, "gene_symbol"))
        .withColumnRenamed("mean.comb", "gismo_mis_mean_comb")
        .withColumnRenamed("dec", "gismo_mis_decile")
        .withColumnRenamed("gene", "transcript")
    )
    both = (
        full_join(g, gm, "gene_symbol")
        .transform(
            lambda d: semi_join(
                d, genes.select(F.col("symbol").alias("gene_symbol")), "gene_symbol"
            )
        )
        .drop("transcript")
        .withColumn("gismo_median", round_r("gismo_median", 3))
        .withColumn("gismo_mis_mean_comb", round_r("gismo_mis_mean_comb", 3))
        .dropDuplicates()
    )
    return keep_unique(both, "gene_symbol").dropDuplicates()


def shet_posterior(raw: DataFrame) -> DataFrame:
    """TM:79-89 (s_het posterior): positional select of columns
    1/2/7/8/9 (P3), bulk positional rename (P5), half-even round-3 of
    the three posterior stats, keep (hgnc_id, shet_post_mean), distinct."""
    from gene_level_metadata_pipeline_spark.operators.headers import (
        rename_all,
        select_positional,
    )

    src = rename_all(
        select_positional(raw, 1, 2, 7, 8, 9),
        ["ens_gene_id", "hgnc_id", "shet_post_mean", "shet_post_lower",
         "shet_post_upper"],
    )
    for c in ("shet_post_mean", "shet_post_lower", "shet_post_upper"):
        src = src.withColumn(c, round_r(c, 3))
    return src.select("hgnc_id", "shet_post_mean").dropDuplicates()


def mair_fitness(raw: DataFrame, condition: str) -> DataFrame:
    """TM:93-102 (Mair 2019 cell fitness, MEF / laminin): positional
    select of columns 1/2/7, positional rename to (gene_symbol,
    bf_<condition>, fdr_<condition>), half-even round-3 of the FDR."""
    from gene_level_metadata_pipeline_spark.operators.headers import (
        rename_all,
        select_positional,
    )

    src = rename_all(
        select_positional(raw, 1, 2, 7),
        ["gene_symbol", f"bf_{condition}", f"fdr_{condition}"],
    )
    return src.withColumn(f"fdr_{condition}", round_r(f"fdr_{condition}", 3))


def rosen_score(raw: DataFrame, rename_to: str | None = None) -> DataFrame:
    """TM:104-127 (Rosen 2024 pluripotency / self-renewal scores):
    positional select of columns 1 and 11 (P3), promote the first data
    row to the header (P7+O4, TM:107-109), cast the score column to
    double and half-even round-2 (TM:110), optionally rename the score
    column by position (TM:111 / TM:120 ``rename(x=2)``)."""
    from gene_level_metadata_pipeline_spark.operators.headers import (
        promote_first_row_to_header,
        select_positional,
    )

    src = promote_first_row_to_header(select_positional(raw, 1, 11))
    score = src.columns[1]
    src = src.withColumn(score, round_r(F.col(score).cast("double"), 2))
    if rename_to is not None:
        src = src.withColumnRenamed(score, rename_to)
    return src


# ---------------------------------------------------------------------------
# TW — web-file score tables (temp-tidy-all-web-files.R), end-to-end
# ---------------------------------------------------------------------------


def depmap_essentiality(gene_effect: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:12-51 (DepMap): the melt-not-transpose flow.

    The reference transposes the models × genes effect matrix in RAM
    (TW:16-18), binarizes at the −0.5 gene-effect threshold (TW:20-21),
    takes rowSums → percentage essential (TW:24-27) and rowMeans
    (TW:29-31), full-joins the two per-gene frames (TW:43-47) and spine
    left-joins (TW:49-51). The engine melts the wide frame instead (R4
    stance: one narrow ``stack`` pass, no wide rows at scale) — one
    groupBy on gene then computes BOTH aggregates in a single pass, so
    the reference's full join degenerates to one agg (same result: both
    sides are keyed by the same gene set).

    Column-name tidy mirrors TW:13-14: gene columns are named
    ``"SYMBOL (entrez)"`` — split on space, keep the first token; the
    first column (R's ``...1``) is the model id, whatever its name.
    """
    from gene_level_metadata_pipeline_spark.operators.reshape import melt

    model_col = gene_effect.columns[0]
    gene_cols = gene_effect.columns[1:]
    long = melt(
        gene_effect, [model_col], gene_cols, var_name="gene_raw",
        value_name="score",
    )
    per_gene = (
        long.withColumn(
            "gene_symbol", F.split(F.col("gene_raw"), r"\s+").getItem(0)
        )
        .groupBy("gene_symbol")
        .agg(
            F.sum(F.when(F.col("score") < -0.5, 1).otherwise(0)).alias(
                "n_essential"
            ),
            F.count(F.lit(1)).alias("n_models"),
            F.avg("score").alias("mean_score_all"),
        )
        .select(
            F.col("gene_symbol").alias(KEY),
            round_r(100.0 * F.col("n_essential") / F.col("n_models"), 3).alias(
                "percentage_essential"
            ),
            round_r("mean_score_all", 3).alias("mean_score_all"),
        )
    )
    return harmonize(spn, per_gene, KEY)


def gtex_expression(gtex: DataFrame, genes: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:58-71 (GTEx median TPM): drop PAR_Y pseudo-autosomal rows
    (TW:61), strip the ensembl version suffix (TW:62), keep only current
    protein-coding ensembl ids (TW:63 %in% → semi join), attach symbols
    via the symbol↔ENSG mapping (TW:65-66), drop Description and the id,
    half-even round-3 every numeric tissue column (TW:69), spine join +
    distinct (TW:71-73)."""
    from pyspark.sql import types as T

    from gene_level_metadata_pipeline_spark.operators.joins import semi_join

    mapping = genes.select(
        F.col("symbol").alias(KEY),
        F.col("ensembl_gene_id"),
    )
    src = (
        gtex.where(~F.col("Name").contains("_PAR_Y"))
        .withColumn("Name", F.regexp_replace("Name", r"\..*", ""))
        .withColumnRenamed("Name", "ensembl_gene_id")
        .drop("Description")
    )
    src = semi_join(src, genes.select("ensembl_gene_id"), "ensembl_gene_id")
    src = src.join(mapping, "ensembl_gene_id", "left").drop("ensembl_gene_id")
    for f in src.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            src = src.withColumn(f.name, round_r(f.name, 3))
    return harmonize(spn, src.dropDuplicates(), KEY)


def constraint_scores(
    gnomad: DataFrame, mane: DataFrame, spn: DataFrame
) -> DataFrame:
    """TW:143-168 (gnomAD LOEUF): project + bulk-rename the constraint
    columns (TW:144-146), keep only transcripts that are MANE or
    canonical per the biomaRt snapshot (TW:147-153 pulled-vector %in% →
    distributed semi join), slice to (gene, LOEUF, mane flag) with
    NULL-symbol drop (TW:154-159), then the prefer-flagged conflict
    resolution (TW:160-166: singleton genes pass, duplicated genes keep
    only ``mane_select == "true"`` rows) and spine join (TW:168-170)."""
    from gene_level_metadata_pipeline_spark.operators.joins import semi_join

    g2 = gnomad.select(
        F.col("gene"),
        F.col("transcript").alias("gnomad_transcript"),
        F.col("mane_select").alias("gnomad_mane_select"),
        F.col("`lof.oe_ci.upper`").alias("gnomad_lof_upper_90_ci"),
    )
    keepable = mane.where(
        ((F.col("transcript_mane_select").isNotNull())
         & (F.col("transcript_mane_select") != ""))
        | (F.col("transcript_is_canonical") == 1)
    ).select(F.col("ensembl_transcript_id").alias("gnomad_transcript"))
    g4 = (
        semi_join(g2, keepable, "gnomad_transcript")
        .select(
            F.col("gene").alias(KEY),
            "gnomad_lof_upper_90_ci",
            "gnomad_mane_select",
        )
        .where(F.col(KEY).isNotNull())
        .dropDuplicates()
    )
    g5 = (
        prefer_flagged(g4, KEY, "gnomad_mane_select", "true")
        .drop("gnomad_mane_select")
        .withColumnRenamed("gnomad_lof_upper_90_ci", "LOEUF")
    )
    return harmonize(spn, g5, KEY)


def hpa_bulk_expression(hpa: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:74-81 (HPA bulk expression): keep Reliability == 'Approved'
    rows, drop the ensembl Gene id and the Reliability column, rename
    `Gene name` to the spine key, spine join + distinct."""
    src = (
        hpa.where(F.col("Reliability") == "Approved")
        .drop("Gene", "Reliability")
        .withColumnRenamed("Gene name", KEY)
    )
    return harmonize(spn, src.dropDuplicates(), KEY)


def lymphoblastoid_expression(lts: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:84-91 (lymphoblastoid time-series TPM): drop `Gene ID`,
    rename `Gene Name` to the spine key, spine join + distinct."""
    src = lts.drop("Gene ID").withColumnRenamed("Gene Name", KEY)
    return harmonize(spn, src.dropDuplicates(), KEY)


def hpa_subcellular_location(atlas: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:95-103 (HPA subcellular location): project (Gene, Subcellular
    location), explode the comma-packed locations (R1 separate_rows),
    drop NULL locations, rename, spine join + distinct."""
    src = separate_rows(
        atlas.select("Gene", "Subcellular location"),
        "Subcellular location",
        ",",
    ).where(F.col("`Subcellular location`").isNotNull())
    return harmonize(
        spn, src.withColumnRenamed("Gene", KEY).dropDuplicates(), KEY
    )


def hpa_protein_classes(atlas: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:108-116 (HPA protein classes): comma-packed classes exploded
    (R1), whitespace-trimmed (the packed form pads after commas),
    rename, spine join + distinct."""
    src = separate_rows(
        atlas.select("Gene", "Protein class"), "Protein class", ","
    ).withColumn("Protein class", F.trim(F.col("`Protein class`")))
    return harmonize(
        spn, src.withColumnRenamed("Gene", KEY).dropDuplicates(), KEY
    )


def ogee_connectivity(ppi: DataFrame, genes: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:119-125 (OGEE/STRING connectivity): %in% protein-coding filter
    (semi join), project (gene, score, connectivity, percentile),
    rename to the spine key, spine join + distinct."""
    from gene_level_metadata_pipeline_spark.operators.joins import semi_join

    src = semi_join(
        ppi.select("gene", "score", "connectivity", "percentile"),
        genes.select(F.col("symbol").alias("gene")),
        "gene",
    ).withColumnRenamed("gene", KEY)
    return harmonize(spn, src.dropDuplicates(), KEY)


def dbnsfp_haploinsufficiency(dbnsfp: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:131-137 (dbNSFP ClinGen HI scores): project (Gene_name, HI
    score), drop the '.' sentinel rows (the dbNSFP missing marker),
    rename, spine join + distinct."""
    src = (
        dbnsfp.select("Gene_name", "ClinGen_Haploinsufficiency_Score")
        .where(F.col("ClinGen_Haploinsufficiency_Score") != ".")
        .withColumnRenamed("Gene_name", KEY)
    )
    return harmonize(spn, src.dropDuplicates(), KEY)


def impc_window_of_lethality(wol: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:185-192 (IMPC window of lethality): project (hs_gene_symbol,
    wol), rename, distinct, spine join."""
    src = (
        wol.select("hs_gene_symbol", "wol")
        .withColumnRenamed("hs_gene_symbol", KEY)
        .dropDuplicates()
    )
    return harmonize(spn, src, KEY)


def dbnsfp_gwas_traits(dbnsfp: DataFrame, spn: DataFrame) -> DataFrame:
    """TW:195-216 (dbNSFP GWAS catalog traits): strip bracketed
    citations from the packed trait string (TW:199), explode on ';'
    (TW:201), trim and drop empties (TW:203-204), '.'-sentinel → NULL
    across columns (TW:205), drop NULL traits, rename, spine join +
    distinct."""
    packed = dbnsfp.select(
        "Gene_name",
        F.regexp_replace(
            F.col("`Trait_association(GWAS)`"), r"\[[^]]*\]", ""
        ).alias("no_brackets"),
    )
    exploded = separate_rows(packed, "no_brackets", ";").withColumn(
        "no_brackets", F.trim("no_brackets")
    ).where(F.col("no_brackets") != "")
    cleaned = (
        nullify(exploded, ".")
        .withColumnRenamed("no_brackets", "GWAS_trait")
        .dropDuplicates()
        .where(F.col("GWAS_trait").isNotNull())
        .withColumnRenamed("Gene_name", KEY)
    )
    return harmonize(spn, cleaned, KEY)

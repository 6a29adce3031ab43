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
    sentence_case,
)
from gene_level_metadata_pipeline_spark.operators.conflicts import (
    keep_unique,
    null_conflicts,
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

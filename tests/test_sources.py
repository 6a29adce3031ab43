"""Ingest loop + bronze writer tests (SURVEY.md §2.2 K1/K4, §2.13 E1)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from gene_level_metadata_pipeline_spark.sources.sinks import ingest_sources, write_bronze


def test_ingest_isolates_failures_and_reports(spark):
    root = tempfile.mkdtemp(prefix="bronze_")
    logs: list[str] = []

    def good():
        return spark.range(5).withColumn("v", F.col("id") * 2)

    def bad():
        raise RuntimeError("boom: upstream 503")

    errors = ingest_sources({"good_src": good, "bad_src": bad}, root, log=logs.append)

    assert set(errors) == {"bad_src"}
    assert "RuntimeError" in errors["bad_src"]
    # the good source landed as readable parquet despite the failure
    back = spark.read.parquet(f"{root}/good_src")
    assert back.count() == 5
    assert any("1 of 2 sources failed" in m for m in logs)


def test_write_bronze_partitioned(spark):
    root = tempfile.mkdtemp(prefix="bronze_")
    df = spark.createDataFrame(
        [("r1", "a"), ("r2", "a"), ("r3", "b")], ["id", "release"]
    )
    path = write_bronze(df, root, "src", partition_by=["release"])
    back = spark.read.parquet(path)
    assert back.count() == 3
    # partition pruning works on the layout
    pruned = back.where(F.col("release") == "a")
    assert pruned.count() == 2
    # and is visible in the physical plan: the partition predicate must be
    # a PartitionFilter (directory-level skip), not a post-scan Filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "(release" in plan.split("PartitionFilters")[1].split("]")[0]


def test_data_filter_pushed_to_parquet_scan(spark):
    sf = "/root/testdata/sf0.001"
    df = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_totalprice")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # predicate reaches the scan (row-group stats skipping at scale) …
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "o_orderpriority" in pushed
    # … and the scan schema is pruned to the referenced columns only
    read_schema = plan.split("ReadSchema")[1]
    assert "o_custkey" not in read_schema


def test_read_excel_by_name_and_startrow(spark):
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import read_excel
    from gene_level_metadata_pipeline_spark.sources.xlsx import sheet_names

    path = f"{fixture_dir()}/workbook.xlsx"
    assert sheet_names(path) == ["Scores", "Meta"]
    # sheet by name with startRow skipping the banner (IM:13 startRow=2)
    meta = read_excel(spark, path, sheet="Meta", skip=1)
    rows = [tuple(r) for r in meta.collect()]
    assert meta.columns == ["key", "val"]
    assert rows == [("k1", 10.0)]  # numerics uniformly double


def test_xlsx_row_gaps_preserved(spark):
    import zipfile

    from gene_level_metadata_pipeline_spark.plans.fixtures import (
        _write_min_xlsx, fixture_dir,
    )
    from gene_level_metadata_pipeline_spark.sources.xlsx import read_xlsx_rows

    W = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    src = f"{fixture_dir()}/workbook.xlsx"
    path = "/tmp/rowgap.xlsx"
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(path, "w") as zout:
        for nm in zin.namelist():
            if nm == "xl/worksheets/sheet1.xml":
                # row 2 omitted from the XML entirely (blank in Excel terms)
                zout.writestr(nm,
                    f'<worksheet xmlns="{W}"><sheetData>'
                    '<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>'
                    '<row r="3"><c r="A3" t="inlineStr"><is><t>x</t></is></c></row>'
                    "</sheetData></worksheet>")
            else:
                zout.writestr(nm, zin.read(nm))
    rows = read_xlsx_rows(path, sheet=0)
    # blank row preserved at index 1 (padded to the rectangular width)
    assert rows == [["h"], [None], ["x"]]


def test_engine_facade_end_to_end(spark, tmp_path):
    """The reference workflow through the facade: messy read -> clean ->
    spine -> harmonize -> catalog/SQL."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.engine import Engine

    eng = Engine(spark)
    p = tmp_path / "hgnc.tsv"
    p.write_text(
        "# banner\nsymbol\tprev_symbol\nG1\tOLD1|OLD2\nG2\t\nG1\tOLD1|OLD2\n"
    )
    genes = eng.read_delim(str(p), sep="\t", skip=1)
    eng.put("genes", genes)
    assert eng.sql("SELECT count(*) AS n FROM genes").collect()[0].n == 3

    spn = eng.spine(genes, "symbol")
    cleaned = eng.separate_rows(
        genes.withColumn(
            "prev_symbol", F.when(F.col("prev_symbol") == "", None)
            .otherwise(F.col("prev_symbol"))
        ),
        "prev_symbol", r"\|",
    )
    out = eng.harmonize(spn, cleaned, "symbol")
    rows = {(r.symbol, r.prev_symbol) for r in out.collect()}
    assert rows == {("G1", "OLD1"), ("G1", "OLD2"), ("G2", None)}


def test_json_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE schema-on-read: malformed JSONL lines land in the
    corrupt-record column instead of killing the scan — per-ROW error
    isolation complementing ingest_sources' per-SOURCE isolation (E1)."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"g": "G1", "v": 1}\n'
        "THIS IS NOT JSON\n"
        '{"g": "G2", "v": 2}\n'
    )
    df = (
        spark.read.schema("g string, v long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = {(r.g, r.v) for r in rows if r._corrupt_record is None}
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert good == {("G1", 1), ("G2", 2)}
    assert bad == ["THIS IS NOT JSON"]


def test_csv_dropmalformed_mode(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text("g,v\nG1,1\nG2,notanumber\nG3,3\n")
    df = (
        spark.read.schema("g string, v long")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert {(r.g, r.v) for r in df.collect()} == {("G1", 1), ("G3", 3)}


def test_json_nested_roundtrip_replaces_rds(spark, tmp_path):
    """K2: the reference's .rds escape hatch ('list so rds not parquet',
    I:219) is unnecessary — nested structs round-trip through JSON."""
    from pyspark.sql import functions as F

    src = spark.createDataFrame(
        [(1, ("p1", [1, 2])), (2, ("p2", []))],
        "id int, panel struct<name:string, hits:array<int>>",
    )
    path = str(tmp_path / "nested")
    src.write.mode("overwrite").json(path)
    back = spark.read.json(path).select(
        "id", F.col("panel.name"), F.col("panel.hits")
    )
    got = {(r.id, r.name, tuple(r.hits)) for r in back.collect()}
    assert got == {(1, "p1", (1, 2)), (2, "p2", ())}


def test_custom_datasource_page_partitions(spark):
    """PageSource: one input partition per page — the parallel upgrade of
    the reference's sequential REST loop (S11)."""
    from gene_level_metadata_pipeline_spark.sources.pagesource import PageSource

    spark.dataSource.register(PageSource)
    df = (
        spark.read.format("genepages")
        .option("pages", 6).option("perpage", 10).load()
    )
    assert df.rdd.getNumPartitions() == 6
    rows = df.collect()
    assert len(rows) == 60
    assert {r.page for r in rows} == set(range(6))
    assert [r.gene for r in rows if r.record_id == 13] == ["G13"]


def test_custom_datasource_writer_two_phase_commit(spark, tmp_path):
    """PageSource write path: executors write one JSONL file per partition,
    the driver's commit() publishes _MANIFEST — the success marker a failed
    job never writes (FileCommitProtocol semantics in the Python API)."""
    import json
    import os

    from gene_level_metadata_pipeline_spark.sources.pagesource import PageSource

    spark.dataSource.register(PageSource)
    df = (
        spark.read.format("genepages")
        .option("pages", 4).option("perpage", 5).load()
    )
    out = str(tmp_path / "sink")
    df.write.format("genepages").option("path", out).mode("overwrite").save()

    with open(os.path.join(out, "_MANIFEST"), encoding="utf-8") as f:
        manifest = json.load(f)
    assert manifest["rows"] == 20
    assert len(manifest["files"]) == 4  # one data file per input partition
    assert all(os.path.exists(p) for p in manifest["files"])

    back = [
        json.loads(line)
        for p in manifest["files"]
        for line in open(p, encoding="utf-8")
    ]
    assert {(r["page"], r["record_id"]) for r in back} == {
        (r.page, r.record_id) for r in df.collect()
    }

    # overwrite replaces the previous sink contents wholesale
    df.limit(0).write.format("genepages").option("path", out).mode(
        "overwrite"
    ).save()
    with open(os.path.join(out, "_MANIFEST"), encoding="utf-8") as f:
        assert json.load(f)["rows"] == 0


def test_custom_datasource_stream_writer_per_batch_manifests(spark, tmp_path):
    """PageSource streaming sink: one _MANIFEST-<batchId> per micro-batch,
    published only by the driver's commit — files a manifest doesn't
    reference are invisible, so replayed batches can't duplicate."""
    import glob
    import json
    import os
    import time

    from gene_level_metadata_pipeline_spark.sources.pagesource import PageSource

    spark.dataSource.register(PageSource)
    out = str(tmp_path / "stream_sink")
    q = (
        spark.readStream.format("genepages")
        .option("pages", 3).option("perpage", 25).load()
        .writeStream.format("genepages")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if len(glob.glob(os.path.join(out, "_MANIFEST-*"))) >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    manifests = [
        json.load(open(p, encoding="utf-8"))
        for p in sorted(glob.glob(os.path.join(out, "_MANIFEST-*")))[:3]
    ]
    assert [m["batch"] for m in manifests] == [0, 1, 2]
    rows = [
        json.loads(line)
        for m in manifests
        for p in m["files"]
        for line in open(p, encoding="utf-8")
    ]
    # one page per micro-batch, 25 records each, no dups and no gaps
    assert sorted(r["record_id"] for r in rows) == list(range(75))
    assert {r["page"] for r in rows} == {0, 1, 2}

    # a second commit for an already-manifested batch is a no-op
    class _M:
        def __init__(self, file, count):
            self.file, self.count = file, count

    from gene_level_metadata_pipeline_spark.sources.pagesource import (
        _PageStreamWriter,
    )

    w = _PageStreamWriter({"path": out})
    stray = os.path.join(out, "stage-replay.jsonl")
    open(stray, "w").close()
    before = json.load(
        open(os.path.join(out, "_MANIFEST-0"), encoding="utf-8")
    )
    w.commit([_M(stray, 1)], 0)
    after = json.load(
        open(os.path.join(out, "_MANIFEST-0"), encoding="utf-8")
    )
    assert after == before  # first attempt kept
    assert not os.path.exists(stray)  # replay's staged file cleaned up


def test_normalize_event_ts_rejects_schema_drift(spark):
    """Unexpected physical ts types must fail at the normalization
    boundary with a clear message, not downstream (ADVICE r1)."""
    import pytest

    from gene_level_metadata_pipeline_spark.sources.readers import (
        normalize_event_ts,
    )

    drifted = spark.createDataFrame([("2024-01-01",)], "ts string")
    with pytest.raises(TypeError, match="normalize_event_ts.*unsupported"):
        normalize_event_ts(drifted)

    ok = spark.createDataFrame([(1_700_000_000_000_000_000,)], "ts long")
    assert normalize_event_ts(ok).schema["ts"].dataType.simpleString() == "timestamp"


def test_row_order_ops_guard(spark):
    """Row-order ops enforce the ingest-edge contract (VERDICT r1 item 7):
    shuffled inputs raise; small unshuffled inputs pass."""
    import pytest

    from gene_level_metadata_pipeline_spark.operators.headers import (
        promote_first_row_to_header,
        with_row_id,
    )

    ok = spark.createDataFrame(
        [("gene", "score"), ("G1", "0.5")], ["X1", "X2"]
    )
    out = promote_first_row_to_header(ok)
    assert out.columns == ["gene", "score"]

    shuffled = ok.repartition(4)
    with pytest.raises(ValueError, match="shuffle"):
        with_row_id(shuffled)

    grouped = ok.groupBy("X1").count()
    with pytest.raises(ValueError, match="shuffle"):
        promote_first_row_to_header(grouped)


def test_row_order_ops_allow_broadcast_decorated_frames(spark):
    """BroadcastExchange is not a shuffle: a small ingest frame decorated
    by a broadcast join keeps probe-side file order and must stay legal
    for row-order ops; only shuffle Exchanges reject (ADVICE r2)."""
    import pytest
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.headers import with_row_id

    ingest = spark.createDataFrame(
        [("G1", "a"), ("G2", "b")], ["sym", "v"]
    )
    dim = spark.createDataFrame([("a", "alpha"), ("b", "beta")], ["v", "name"])
    decorated = ingest.join(F.broadcast(dim), "v", "left")
    plan = decorated._jdf.queryExecution().executedPlan().toString()
    if "BroadcastExchange" in plan:  # guard the premise, not just the call
        out = with_row_id(decorated)
        assert out.count() == 2

    with pytest.raises(ValueError, match="shuffle"):
        with_row_id(ingest.join(dim, "v"))  # SMJ/shuffle path


def test_read_delim_whitespace_runs(spark, tmp_path):
    """S6: sep=None mirrors R read.table — any RUN of whitespace (mixed
    spaces/tabs, uneven widths) separates fields; blank lines skipped;
    header + schema inference behave like the single-char path."""
    from gene_level_metadata_pipeline_spark.sources.readers import read_delim

    p = tmp_path / "gnomad_like.txt"
    p.write_text(
        "gene   transcript\tpLI\n"
        "BRCA1     ENST0001   0.01\n"
        "\n"
        "TP53\t\tENST0002\t 0.99\n"
    )
    df = read_delim(spark, str(p), sep=None)
    assert df.columns == ["gene", "transcript", "pLI"]
    rows = {r["gene"]: (r["transcript"], r["pLI"]) for r in df.collect()}
    assert rows == {"BRCA1": ("ENST0001", 0.01), "TP53": ("ENST0002", 0.99)}

    # headerless + skip compose with the whitespace path
    q = tmp_path / "nohdr.txt"
    q.write_text("# banner\na b 1\nc d 2\n")
    df2 = read_delim(spark, str(q), sep=None, header=False, skip=1)
    assert df2.columns == ["V1", "V2", "V3"]
    assert df2.count() == 2


def test_read_delim_whitespace_unbalanced_quote_raises(spark, tmp_path):
    """S6 fail-loud contract (r3 ADVICE): an unbalanced double quote
    would make the quote-aware tokenizer silently merge fields across
    whitespace to the next quote later on the line; R's read.table
    raises 'EOF within quoted string' instead — so do we. Balanced
    quoted fields (including interior whitespace) still parse."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from gene_level_metadata_pipeline_spark.sources.readers import read_delim

    good = tmp_path / "balanced.txt"
    good.write_text('gene desc score\ng1 "tumor suppressor" 0.5\n')
    df = read_delim(spark, str(good), sep=None)
    assert [tuple(r) for r in df.collect()] == [("g1", "tumor suppressor", 0.5)]

    bad = tmp_path / "unbalanced.txt"
    bad.write_text('gene desc score\ng1 "tumor suppressor 0.5\n')
    with pytest.raises(SparkRuntimeException, match="EOF within quoted string"):
        read_delim(spark, str(bad), sep=None).collect()


def test_pipeline_config_env_and_masking(monkeypatch):
    """E2: secrets resolve from env with placeholder-default semantics
    (empty string == unset, like the reference's gitignored overrides);
    repr masks them; require() raises a clear error when absent."""
    import pytest

    from gene_level_metadata_pipeline_spark.config import PipelineConfig

    monkeypatch.delenv("OMIM_API_KEY", raising=False)
    monkeypatch.setenv("LETHAL_GENES_TOKEN", "")  # empty == unset
    cfg = PipelineConfig()
    assert cfg.omim_api_key is None
    assert cfg.lethal_genes_token is None
    assert cfg.impc_release_version == "22.1"  # reference pin I:16
    with pytest.raises(RuntimeError, match="OMIM_API_KEY"):
        cfg.require("omim_api_key")

    monkeypatch.setenv("OMIM_API_KEY", "sekret")
    monkeypatch.setenv("IMPC_RELEASE_VERSION", "23.0")
    cfg2 = PipelineConfig()
    assert cfg2.require("omim_api_key") == "sekret"
    assert cfg2.impc_release_version == "23.0"
    assert "sekret" not in repr(cfg2) and "***" in repr(cfg2)


def test_engine_facade_curation_path(spark):
    """The curation workflow through the facade: near-dup pairs ->
    canonical representative per cluster."""
    from gene_level_metadata_pipeline_spark.engine import Engine

    eng = Engine(spark)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "an entirely different document about spark shuffles"),
        ],
        "doc_id bigint, text string",
    )
    pairs = eng.near_dup_pairs(docs, "text", "doc_id", threshold=0.3)
    assert {(r.doc_a, r.doc_b) for r in pairs.collect()} == {(1, 2)}
    canon = {
        (r.doc_id, r.canonical_id)
        for r in eng.canonicalize_duplicates(docs, pairs).collect()
    }
    assert canon == {(1, 1), (2, 1), (3, 3)}


def test_read_binary_assets_feeds_multimodal_contract(spark):
    """binaryFile ingestion composes with the Arrow featurizer: glob
    excludes the decoy at listing time, payload bytes stay executor-side,
    and extract_features consumes the contract unchanged."""
    from pyspark.sql import functions as F

    from gene_level_metadata_pipeline_spark.operators.multimodal import (
        extract_features,
    )
    from gene_level_metadata_pipeline_spark.plans.fixtures import fixture_dir
    from gene_level_metadata_pipeline_spark.sources.readers import (
        read_binary_assets,
    )

    assets = read_binary_assets(
        spark, f"{fixture_dir()}/assets", glob="*.bin", modality="image/fake"
    )
    rows = {r.asset_id: r for r in assets.collect()}
    assert set(rows) == {"img_a.bin", "img_b.bin"}  # notes.txt excluded
    assert rows["img_a.bin"].meta.n_bytes == 16
    assert bytes(rows["img_a.bin"].payload) == bytes(range(16))

    feats = extract_features(
        assets.withColumn("doc_id", F.xxhash64("asset_id")), "doc_id"
    )
    got = {r.n_bytes: r for r in feats.collect()}
    assert got[16].checksum == sum(range(16))
    assert got[16].head_bytes == [0, 1, 2, 3]
    assert got[40].head_bytes == [0x89, ord("F"), ord("A"), ord("K")]

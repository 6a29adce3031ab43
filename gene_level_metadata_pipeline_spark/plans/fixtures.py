"""Deterministic on-disk fixtures for the messy-ingestion readers.

The driver's TPC-H tables can't exercise skip-N banners, headerless files,
zip wrapping, shifted headers, or promote-first-row (FIXTURES.md F5/F11/F12
shapes) — so the reader queries materialize these tiny deterministic files
and their oracles are literal ``VALUES`` SQL. Idempotent; written under
/tmp, never under the read-only testdata tree.
"""

from __future__ import annotations

import json
import os
import zipfile

FIXTURE_DIR = "/tmp/spark_graft_fixtures"


def fixture_dir() -> str:
    """Create (once) and return the fixture directory."""
    d = FIXTURE_DIR
    os.makedirs(d, exist_ok=True)
    os.makedirs(f"{d}/pages", exist_ok=True)

    def w(rel: str, content: str) -> None:
        path = os.path.join(d, rel)
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(content)

    # S2: banner lines before the header (OMIM shape, I:167-181)
    w("skip.tsv",
      "# fetched 2025-01-01 from example\n"
      "# build GRCh38\n"
      "gene\tscore\tflag\n"
      "g1\t1.5\ty\n"
      "g2\t2.0\tn\n"
      "g3\t\ty\n")

    # S4: headerless positional columns (MGI GenePheno shape, I:117-120)
    w("headerless.csv", "a,1,x\nb,2,y\nc,3,z\n")

    # S6: runs-of-whitespace separators, mixed tabs/spaces + a blank line
    # (gnomAD constraint-metrics shape read by read.table, IW:19)
    w("whitespace.txt",
      "gene   transcript\tpli\n"
      "g1     ENST01   0.01\n"
      "\n"
      "g2\t\tENST02\t 0.99\n")

    # S7: TSV inside a zip (IW:22-23)
    zpath = os.path.join(d, "fixture.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            zf.writestr("inner.tsv", "id\tval\nk1\t10\nk2\t20\n")

    # P6: header shifted one column left (orthologs shape, T:503-511)
    w("shifted.tsv",
      "idx\tgene\tscore\n"
      "g1\t1.5\tJUNK\n"
      "g2\t2.5\tJUNK\n")

    # P7: real header sits in data row 1 (Rosen workbook shape, TM:107-109)
    w("promote.csv", "gene,score\ng1,1.5\ng2,2.0\n")

    # Provenance: a two-file parquet directory with STABLE file names so
    # the hidden _metadata.file_name column is oracle-checkable
    prov = os.path.join(d, "prov")
    if not os.path.isdir(prov):
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(prov, exist_ok=True)
        pq.write_table(
            pa.table({"k": [1, 2], "v": ["x", "y"]}),
            os.path.join(prov, "batch_a.parquet"),
        )
        pq.write_table(
            pa.table({"k": [3], "v": ["z"]}),
            os.path.join(prov, "batch_b.parquet"),
        )

    # S-family: RFC-4180 quoted fields with embedded newlines + "" quotes
    # (free-text annotation columns, e.g. OMIM phenotype notes)
    w("multiline.csv",
      'id,note,score\n'
      '1,"line one\nline two",3.5\n'
      '2,"has ""quotes"" and, commas",4.0\n')

    # S9: two-sheet xlsx (Rosen workbook shape, IM:19-22 / TM:105-127),
    # hand-built zipped XML with inline strings — no Excel engine needed
    xpath = os.path.join(d, "workbook.xlsx")
    if not os.path.exists(xpath):
        _write_min_xlsx(xpath)

    # XML annotation export (S-family extension; Spark 4 native XML)
    w("annotations.xml",
      "<genes>\n"
      "  <gene><symbol>g1</symbol><score>1.5</score><tag>a</tag></gene>\n"
      "  <gene><symbol>g2</symbol><score>2.5</score></gene>\n"
      "</genes>\n")

    # S11: paginated JSON (PanelApp shape, I:211-218)
    w("pages/page1.json",
      json.dumps({"gene_symbol": "g1", "panel": {"id": 1, "name": "p1"}}) + "\n")
    w("pages/page2.json",
      json.dumps({"gene_symbol": "g2", "panel": {"id": 2, "name": "p2"}}) + "\n")

    # T:441-498 full flow: records with confidence levels, a missing
    # disease_group (NA→'-' fill), an empty one (filtered), and a noise key
    os.makedirs(f"{d}/panel_pages", exist_ok=True)
    w("panel_pages/p1.json", "\n".join([
        json.dumps({"gene_symbol": "g1", "confidence_level": "3",
                    "disease_group": "cardiac", "noise": "x"}),
        json.dumps({"gene_symbol": "g2", "confidence_level": "2",
                    "disease_group": "neuro", "noise": "y"}),
    ]) + "\n")
    w("panel_pages/p2.json", "\n".join([
        json.dumps({"gene_symbol": "g3", "confidence_level": "1",
                    "noise": "z"}),
        json.dumps({"gene_symbol": "g4", "confidence_level": "3",
                    "disease_group": "", "noise": "w"}),
    ]) + "\n")

    # raw media assets for the binaryFile ingest path (multimodal S-ext):
    # two deterministic .bin payloads + a decoy the glob must exclude
    os.makedirs(f"{d}/assets", exist_ok=True)

    def wb(rel: str, content: bytes) -> None:
        path = os.path.join(d, rel)
        if not os.path.exists(path):
            with open(path, "wb") as f:
                f.write(content)

    wb("assets/img_a.bin", bytes(range(16)))
    wb("assets/img_b.bin", b"\x89FAKEPNG" + bytes(range(255, 223, -1)))
    wb("assets/notes.txt", b"not a media asset")
    return d


def _write_min_xlsx(path: str) -> None:
    """Two-sheet workbook: Scores(gene,score) and Meta with a banner row
    (exercises sheet-by-name + startRow)."""
    W = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    P = "http://schemas.openxmlformats.org/package/2006/relationships"
    CT = "http://schemas.openxmlformats.org/package/2006/content-types"

    def s(ref, text):
        return (f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>')

    def n(ref, num):
        return f'<c r="{ref}"><v>{num}</v></c>'

    sheet1 = (
        f'<worksheet xmlns="{W}"><sheetData>'
        f'<row r="1">{s("A1","gene")}{s("B1","score")}</row>'
        f'<row r="2">{s("A2","g1")}{n("B2",1.5)}</row>'
        f'<row r="3">{s("A3","g2")}{n("B3",2.5)}</row>'
        "</sheetData></worksheet>"
    )
    sheet2 = (
        f'<worksheet xmlns="{W}"><sheetData>'
        f'<row r="1">{s("A1","banner row - ignore")}</row>'
        f'<row r="2">{s("A2","key")}{s("B2","val")}</row>'
        f'<row r="3">{s("A3","k1")}{n("B3",10)}</row>'
        "</sheetData></worksheet>"
    )
    workbook = (
        f'<workbook xmlns="{W}" xmlns:r="{R}"><sheets>'
        '<sheet name="Scores" sheetId="1" r:id="rId1"/>'
        '<sheet name="Meta" sheetId="2" r:id="rId2"/>'
        "</sheets></workbook>"
    )
    # real ECMA-376 relationship-type URIs + content-type overrides, so an
    # actual Excel engine (openpyxl, when present) opens this workbook too
    wb_rels = (
        f'<Relationships xmlns="{P}">'
        f'<Relationship Id="rId1" Type="{R}/worksheet" Target="worksheets/sheet1.xml"/>'
        f'<Relationship Id="rId2" Type="{R}/worksheet" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        f'<Relationships xmlns="{P}">'
        f'<Relationship Id="rId1" Type="{R}/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    types = (
        f'<Types xmlns="{CT}">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet1)
        zf.writestr("xl/worksheets/sheet2.xml", sheet2)

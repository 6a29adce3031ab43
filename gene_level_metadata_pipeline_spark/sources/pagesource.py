"""Custom Python Data Source (Spark 4 DataSource API): paginated pages
as first-class input partitions.

The reference fetches PanelApp REST pages in a sequential driver loop
(`scripts/import/temp-import-all-api-ftp.R:211-218`, 338 pages). This
source models the scalable shape: every page is one ``InputPartition``,
fetched independently ON EXECUTORS — page count = parallelism, stragglers
isolated, one failed page retried alone. The generator here is
deterministic synthetic data (no network in this container); a real REST
client would replace ``_records`` with the HTTP fetch and keep every
other line.

Usage:
    spark.dataSource.register(PageSource)
    df = (spark.read.format("genepages")
          .option("pages", 4).option("perpage", 25).load())
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

__all__ = ["PageSource"]


def _records(page: int, per_page: int):
    """Deterministic stand-in for one page's REST payload."""
    for i in range(per_page):
        rid = page * per_page + i
        yield (page, rid, f"G{rid}", rid % 4)


class _PageReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = int(options.get("pages", 4))
        self.per_page = int(options.get("perpage", 25))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_pages)]

    def read(self, partition):
        yield from _records(partition.value, self.per_page)


class _PageStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: one page per micro-batch, the offset IS the page
    number — exactly-once without a file source in sight. After
    ``pages`` micro-batches the source reports no new data (bounded
    backfill; a live REST feed would keep advancing the offset)."""

    def __init__(self, options):
        self.n_pages = int(options.get("pages", 4))
        self.per_page = int(options.get("perpage", 25))

    def initialOffset(self):
        return {"page": 0}

    def read(self, start):
        p = start["page"]
        if p >= self.n_pages:
            return iter([]), start
        return iter(list(_records(p, self.per_page))), {"page": p + 1}


@dataclass
class _PageCommit(WriterCommitMessage):
    file: str
    count: int


class _PageWriter(DataSourceWriter):
    """Write path of the source: one JSONL file per input partition,
    two-phase commit. Executors write data files and return commit
    messages; ONLY the driver's commit() publishes the _MANIFEST that
    readers treat as the success marker — a failed/aborted job leaves
    data files but no manifest (abort() also best-effort deletes them).
    This is the same visibility protocol Spark's FileCommitProtocol
    gives parquet, expressed in the Python DataSource API; a real
    REST-push sink would swap the file write for PUTs and make commit()
    the transaction finalizer."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("genepages writer requires option 'path'")
        import os
        import shutil

        if overwrite and os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PageCommit(file=fname, count=n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(m.file for m in messages if m is not None),
            "rows": sum(m.count for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST"), "w", encoding="utf-8") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class _PageStreamWriter(DataSourceStreamWriter):
    """Streaming flavor of the sink: the batch protocol, once per
    micro-batch. Executors stage JSONL files under uuid names; the
    driver's ``commit(messages, batchId)`` publishes
    ``_MANIFEST-<batchId>`` naming exactly the files of THAT attempt.
    Exactly-once falls out of the two rules a manifest-honoring reader
    follows: unreferenced files are invisible (a failed attempt's
    leftovers are orphans, never duplicates), and an existing manifest
    makes a replayed commit a no-op (restart between sink commit and
    checkpoint advance re-runs the batch — Structured Streaming's
    documented at-least-once replay window, SS docs "fault tolerance").
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("genepages stream writer requires option 'path'")
        import os

        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(
            self.path, f"stage-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(fname, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PageCommit(file=fname, count=n)

    def commit(self, messages, batchId):
        import json
        import os

        marker = os.path.join(self.path, f"_MANIFEST-{batchId}")
        if os.path.exists(marker):  # replayed batch: keep the first attempt
            for m in messages:
                if m is not None and os.path.exists(m.file):
                    os.remove(m.file)
            return
        manifest = {
            "batch": batchId,
            "files": sorted(m.file for m in messages if m is not None),
            "rows": sum(m.count for m in messages if m is not None),
        }
        with open(marker, "w", encoding="utf-8") as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class PageSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "genepages"

    def schema(self) -> str:
        return "page int, record_id int, gene string, confidence int"

    def reader(self, schema):
        return _PageReader(self.options)

    def simpleStreamReader(self, schema):
        return _PageStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _PageWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _PageStreamWriter(self.options)

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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
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

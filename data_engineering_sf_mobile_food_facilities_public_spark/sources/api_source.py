"""Custom Python DataSource for paged-API scans (Spark 4).

SURVEY.md S1/S2: the reference pulls the Socrata datasets with one
driver-side REST GET (limit=2000, ``/root/reference/airflow.py:71-85``).
The Spark-4 scale mapping is a *custom data source* whose partitions are
API pages: the driver plans N page-partitions, each executor task fetches
and yields its own page — parallel, retryable per-task, and composable
with the rest of the plan (filters over the result still prune columns
via the projection the source yields).

No network exists in this environment, so the transport is pluggable: the
default ``page_rows`` generator synthesizes deterministic Socrata-shaped
rows (seeded per page), and a real deployment swaps in an HTTP fetcher
with the identical page contract.  Everything else — registration,
planning, partition serialization, Arrow row yield — is the real
machinery, exercised in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

API_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.LongType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_CATEGORIES = ("truck", "cart", "stand", "trailer")


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def page_rows(page: int, page_size: int) -> Iterator[tuple]:
    """Deterministic stand-in for one API page fetch (seeded by page)."""
    base = page * page_size
    for i in range(page_size):
        rid = base + i
        h = _h(f"rec:{rid}")
        yield (
            rid,
            page,
            f"vendor_{h % 997}",
            _CATEGORIES[h % len(_CATEGORIES)],
            round((h % 100_000) / 100.0, 2),
        )


class _PagePartition(InputPartition):
    def __init__(self, page: int, page_size: int):
        self.page = page
        self.page_size = page_size


class PagedApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_pages = int(options.get("pages", "4"))
        self.page_size = int(options.get("page_size", "500"))

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per API page -> fetch parallelism == page count
        return [_PagePartition(p, self.page_size) for p in range(self.n_pages)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        # executor-side: fetch (here: synthesize) exactly this page
        return page_rows(partition.page, partition.page_size)


class PagedApiStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the same page contract: the offset is the
    next unread page, each batch covers up to ``pages_per_batch`` new
    pages (bounded by ``max_pages``), and every page in a batch is its
    own executor-side partition — ingestion parallelism == page count,
    replay is exact because offsets are page numbers."""

    def __init__(self, options: dict):
        self.page_size = int(options.get("page_size", "500"))
        self.pages_per_batch = int(options.get("pages_per_batch", "2"))
        self.max_pages = int(options.get("max_pages", "6"))
        self._cursor = 0

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        # Rate limiting lives HERE: each poll advances at most
        # pages_per_batch, capped at max_pages (a real API would probe
        # its cursor) — so drains terminate and batches stay bounded.
        self._cursor = min(self._cursor + self.pages_per_batch, self.max_pages)
        return {"page": self._cursor}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # must honor the exact [start, end) range the engine asks for —
        # clamping here would skip committed-but-unread pages on replay
        return [
            _PagePartition(p, self.page_size)
            for p in range(start["page"], end["page"])
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        return page_rows(partition.page, partition.page_size)

    def commit(self, end: dict) -> None:
        # a real API source would ack/expire its server-side cursor
        pass


class PagedApiDataSource(DataSource):
    """Usage::

        spark.dataSource.register(PagedApiDataSource)
        df = (spark.read.format("paged_api")
              .option("pages", 8).option("page_size", 250).load())

        stream = (spark.readStream.format("paged_api")
                  .option("max_pages", 6).option("page_size", 250).load())
    """

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> T.StructType:
        return API_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return PagedApiReader(self.options)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return PagedApiStreamReader(self.options)


# ---------------------------------------------------------------------------
# Custom Python DataSource WRITER: JSON-lines sink with a commit manifest
# (write-audit-publish at the task level — S8's set-based sink, generalized
# to any python-reachable system).
# ---------------------------------------------------------------------------


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, filename: str, rows: int):
        self.filename = filename
        self.rows = rows


class JsonlAuditWriter(DataSourceWriter):
    """Each task writes its partition to a uniquely-named ``.jsonl``
    file and reports (file, row count) in its commit message; only the
    driver-side ``commit`` — which runs iff every task succeeded —
    publishes the ``_MANIFEST.json`` naming the valid files.  Readers
    trust the manifest, so a failed/retried task's orphan file is
    invisible: per-job exactly-once without renames, the same
    write-audit-publish contract as the parquet snapshot sink."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator):
        import json
        import os
        import uuid

        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages):
        import json
        import os

        files = [
            {"file": m.filename, "rows": m.rows} for m in messages if m is not None
        ]
        manifest = {"files": files, "total_rows": sum(f["rows"] for f in files)}
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class _ManifestFilePartition(InputPartition):
    def __init__(self, path: str, expected_rows: int):
        self.path = path
        self.expected_rows = expected_rows


class JsonlAuditReader(DataSourceReader):
    """Manifest-trusting READ side of the write-audit-publish contract:
    only files named in ``_MANIFEST.json`` are listed — an orphan part
    from a failed/retried task is invisible even though it sits in the
    same directory.  One partition per manifest file, so read
    parallelism == committed-file count, and each task cross-checks its
    file's row count against the manifest (a short read means a file was
    truncated AFTER publish — corruption, and it fails loudly)."""

    def __init__(self, options: dict, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_audit scan requires option 'path'")
        self._schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        import json
        import os

        with open(os.path.join(self.path, "_MANIFEST.json")) as f:
            manifest = json.load(f)
        return [
            _ManifestFilePartition(os.path.join(self.path, e["file"]), e["rows"])
            for e in manifest["files"]
        ]

    def read(self, partition: _ManifestFilePartition) -> Iterator[tuple]:
        import json

        names = [f.name for f in self._schema.fields]
        n = 0
        with open(partition.path) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                n += 1
                yield tuple(rec.get(name) for name in names)
        if n != partition.expected_rows:
            # name the actual corruption mode: short = data loss after
            # publish; long = rows appended/orphaned past the commit
            mode = (
                "truncated after publish"
                if n < partition.expected_rows
                else "rows appended after publish (uncommitted writer?)"
            )
            raise IOError(
                f"{partition.path}: manifest promises {partition.expected_rows} "
                f"rows, file has {n} — {mode}"
            )


class JsonlAuditDataSource(DataSource):
    """``df.write.format("jsonl_audit").option("path", dir)`` sink, and
    the matching manifest-trusting scan::

        spark.read.format("jsonl_audit").schema(ddl).option("path", dir).load()

    The scan requires an explicit schema (JSON lines carry none)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema: T.StructType, overwrite: bool) -> DataSourceWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_audit sink requires option 'path'")
        return JsonlAuditWriter(path)

    def schema(self) -> T.StructType:
        raise ValueError(
            "jsonl_audit scan requires an explicit .schema(...) — JSON "
            "lines are schemaless"
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return JsonlAuditReader(self.options, schema)

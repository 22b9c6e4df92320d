"""Custom Python DataSource (PySpark 4 `pyspark.sql.datasource` API).

The engine's extension point for sources Spark has no built-in reader
for (internal services, bespoke formats, synthetic load). The API
contract demonstrated here is the one any such connector implements:

- ``DataSource.schema()``   — fixed output schema
- ``DataSourceReader.partitions()`` — split planning: N independent
  ``InputPartition``s the scheduler fans out across executors, so a
  read scales horizontally exactly like a parquet scan's file splits
- ``DataSourceReader.read(partition)`` — per-partition row generator
  running IN the executor's Python worker (Arrow-batched back to the
  JVM)

This instance generates a deterministic synthetic corpus — content is a
pure function of ``doc_id`` via md5, so an independent engine (the
DuckDB oracle) reproduces every row bit-for-bit, which turns the whole
source path (planning, fan-out, generation, Arrow transfer) into an
oracle-checkable operator. No reference-repo counterpart: the
reference's only source is seed CSVs (/root/reference/seeds/).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class SyntheticCorpusDataSource(DataSource):
    """``spark.read.format("synthetic_corpus")`` after registration.

    Options: ``numDocs`` (total rows, default 1000), ``numPartitions``
    (read parallelism, default 8)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id bigint, source string, text string"

    def reader(self, schema) -> "SyntheticCorpusReader":
        return SyntheticCorpusReader(
            int(self.options.get("numDocs", 1000)),
            int(self.options.get("numPartitions", 8)),
        )

    def simpleStreamReader(self, schema) -> "_CorpusStreamReader":
        return _CorpusStreamReader(
            int(self.options.get("numDocs", 1000)),
            int(self.options.get("batchSize", 100)),
        )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, num_docs: int, num_partitions: int):
        self.num_docs = num_docs
        self.num_partitions = max(1, min(num_partitions, num_docs))

    def partitions(self):
        # contiguous doc_id ranges — the split planning a real connector
        # would do over files/offsets/shards
        step = -(-self.num_docs // self.num_partitions)
        return [
            _Range(lo, min(lo + step, self.num_docs))
            for lo in range(0, self.num_docs, step)
        ]

    def read(self, partition: _Range):
        for doc_id in range(partition.start, partition.end):
            h = hashlib.md5(str(doc_id).encode()).hexdigest()
            yield (doc_id, f"src_{doc_id % 4}", h)


def register(spark) -> None:
    """Idempotent registration of the engine's Python data sources."""
    spark.dataSource.register(SyntheticCorpusDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", ...)`` — the WRITE
    half of the Python DataSource API, demonstrating the two-phase
    commit protocol every distributed sink needs at scale:

    - ``DataSourceWriter.write(iterator)`` runs IN each executor task
      and stages that partition's rows to a task-unique file (no
      cross-task coordination, no rename races);
    - ``commit(messages)`` runs ONCE on the driver after every task
      succeeded, atomically publishing the staged files (rename into
      the final dir + manifest). A task that ran but whose stage
      message never reaches commit is invisible — same contract as
      Hadoop/Spark file committers;
    - ``abort(messages)`` removes staged files so failed writes leave
      nothing visible.
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return JsonlSinkWriter(self.options["path"], [f.name for f in schema], overwrite)


class _StagedFile(WriterCommitMessage):
    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, path: str, cols: list, overwrite: bool):
        self.path = path
        self.cols = cols
        self.overwrite = overwrite

    def write(self, iterator):
        """Executor-side: stage this partition to a task-unique file."""
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = f"stage-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, fname), "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.cols, row))) + "\n")
                n += 1
        return _StagedFile(fname, n)

    def commit(self, messages):
        """Driver-side: publish exactly the staged files the successful
        tasks reported. Ordering makes the manifest the commit point:
        (1) rename every staged file in (uuid names — no collision with
        the previous generation), (2) write the manifest, (3) only then
        remove superseded files. A crash before (2) leaves the old
        manifest + old files fully intact; readers that honor the
        manifest never observe a partial set."""
        import json
        import os
        import shutil

        os.makedirs(self.path, exist_ok=True)  # zero-task write still commits
        staging = os.path.join(self.path, "_staging")
        superseded = (
            [
                f
                for f in os.listdir(self.path)
                if f.startswith("part-") and f.endswith(".jsonl")
            ]
            if self.overwrite
            else []
        )
        published = []
        for m in messages:
            final = m.file.replace("stage-", "part-")
            os.rename(os.path.join(staging, m.file), os.path.join(self.path, final))
            published.append({"file": final, "rows": m.rows})
        if not self.overwrite:
            # append: the manifest must keep the previous generation's
            # entries — dropping them would orphan committed rows for any
            # manifest-honoring reader even though the files stay on disk
            manifest_path = os.path.join(self.path, "_MANIFEST.json")
            if os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    prior = json.load(fh)
                published = prior + published
        # atomic publish: a crash mid-write must never leave a torn
        # manifest — readers see either the old generation or the new
        # one, nothing in between (os.replace is atomic on POSIX)
        tmp = os.path.join(self.path, "_MANIFEST.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(published, fh)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))
        for f in superseded:
            try:
                os.remove(os.path.join(self.path, f))
            except FileNotFoundError:
                pass
        shutil.rmtree(staging, ignore_errors=True)

    def abort(self, messages):
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class _CorpusStreamReader(SimpleDataSourceStreamReader):
    """Streaming read path for the synthetic corpus: the offset is a
    plain ``{"doc_id": N}`` cursor; each micro-batch reads a bounded
    slice (``batchSize`` docs) so the unbounded source drains in
    deterministic increments. ``readBetweenOffsets`` makes replay after
    failure exact (same offsets → same rows — content is a pure
    function of doc_id), which is the whole exactly-once contract a
    production connector (kafka offsets, log sequence numbers) must
    honor."""

    def __init__(self, num_docs: int, batch_size: int):
        self.num_docs = num_docs
        self.batch_size = batch_size

    def initialOffset(self) -> dict:
        return {"doc_id": 0}

    def _rows(self, start: int, end: int):
        for doc_id in range(start, end):
            h = hashlib.md5(str(doc_id).encode()).hexdigest()
            yield (doc_id, f"src_{doc_id % 4}", h)

    def read(self, start: dict):
        lo = start["doc_id"]
        hi = min(lo + self.batch_size, self.num_docs)
        # a LIST, not a generator: the prefetching cache copy.copy()s
        # the returned iterator when planning partitions
        return iter(list(self._rows(lo, hi))), {"doc_id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["doc_id"], end["doc_id"])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — the source is stateless

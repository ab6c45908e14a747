"""Custom Python DataSource (Spark 4): deterministic synthetic telemetry.

The Spark-4 connector surface in pure Python — `spark.dataSource.
register` + `spark.read.format("synthetic_events")` — demonstrated with
a generator whose every field is md5-derived from the row id, so the
produced data is engine-reproducible: a SQL engine can regenerate the
identical rows from a bare integer range (the registry oracle does
exactly that), which turns a *connector* into something value-hash
checkable.

Scale notes: partitions() splits the id range into `n_partitions`
independent slices — each executor generates its slice with no driver
coordination and no shuffle, the same contract a real partitioned
connector (JDBC ranges, kafka topic-partitions, object-store listings)
fulfills. A Python data source pays one Python worker per partition —
fine for generators and niche formats; bulk columnar IO should stay on
the JVM readers (parquet/orc/csv built-ins).
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

DEFAULT_ROWS = 2000
DEFAULT_PARTITIONS = 8
DEFAULT_USERS = 50


def _h6(tag: str, i: int) -> int:
    """First 6 hex digits of md5(tag||i) as an int — the same
    content-hash-derived uniform draw the sampling/split operators use
    (u01 = _h6/16777216); reproducible in any engine with md5."""
    return int(hashlib.md5(f"{tag}{i}".encode()).hexdigest()[:6], 16)


def synth_row(i: int, n_users: int = DEFAULT_USERS) -> tuple[int, int, float]:
    """Row i of the synthetic stream: (event_id, user_id, value).
    user_id = h6('u', i) mod n_users; value = floor(u01('v', i)·50000
    + 0.5)/100 — a 2-decimal double in [0, 500]."""
    user = _h6("u", i) % n_users
    u01 = _h6("v", i) / 16777216.0
    value = (int(u01 * 50000.0 + 0.5)) / 100.0
    return i, user, value


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events")` — options: `n_rows`,
    `n_partitions`, `n_users`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value double"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticReader(
            int(self.options.get("n_rows", DEFAULT_ROWS)),
            int(self.options.get("n_partitions", DEFAULT_PARTITIONS)),
            int(self.options.get("n_users", DEFAULT_USERS)),
        )

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SyntheticStreamReader(
            int(self.options.get("n_rows", DEFAULT_ROWS)),
            int(self.options.get("batch_rows", 500)),
            int(self.options.get("n_users", DEFAULT_USERS)),
        )


class _SyntheticReader(DataSourceReader):
    def __init__(self, n_rows: int, n_partitions: int, n_users: int) -> None:
        self.n_rows, self.n_partitions, self.n_users = n_rows, n_partitions, n_users

    def partitions(self):
        step = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            InputPartition((lo, min(lo + step, self.n_rows)))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield synth_row(i, self.n_users)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Streaming read of the same md5-derived rows, `batch_rows` per
    micro-batch. Offsets are plain row positions; once `n_rows` is
    reached `read` returns an empty batch with an unchanged offset, so
    processAllAvailable terminates — the bounded-replay shape used by
    the batch-equality test. readBetweenOffsets replays any committed
    range deterministically (the recovery contract)."""

    def __init__(self, n_rows: int, batch_rows: int, n_users: int) -> None:
        self.n_rows, self.batch_rows, self.n_users = n_rows, batch_rows, n_users

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        if pos >= self.n_rows:
            return iter([]), {"pos": pos}
        end = min(pos + self.batch_rows, self.n_rows)
        return iter([synth_row(i, self.n_users) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            [synth_row(i, self.n_users) for i in range(start["pos"], end["pos"])]
        )


def register(spark) -> None:
    """Idempotent registration (re-register is a no-op overwrite)."""
    spark.dataSource.register(SyntheticEventsDataSource)


class JsonlManifestDataSource(DataSource):
    """`df.write.format("jsonl_manifest").mode("append").option("path", ...)`
    (Python sinks accept append/overwrite modes only) —
    a pure-Python SINK demonstrating the writer half of the Spark-4
    DataSource API and its commit protocol: each task writes one
    `part-<uuid>.jsonl` shard and returns a WriterCommitMessage with
    (file, row count); `commit()` runs ONCE on the driver with every
    task's message and only then publishes `_MANIFEST.json` — readers
    that require the manifest therefore never observe a partial write
    (task retries leave orphan part files, never a torn manifest;
    `abort()` documents the cleanup hook).
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool):
        return _JsonlManifestWriter(self.options["path"], [f.name for f in schema])


class _JsonlManifestWriter(DataSourceWriter):
    def __init__(self, path: str, cols: list[str]) -> None:
        self.path, self.cols = path, cols

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.cols, row))) + "\n")
                n += 1
        return WriterCommitMessage_(fname, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted({m.file: m.n_rows for m in messages}.items()),
            "total_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        # Orphan part files are harmless without a manifest; a hardened
        # sink would unlink the files named in `messages` here.
        pass


class WriterCommitMessage_(WriterCommitMessage):
    def __init__(self, file: str, n_rows: int) -> None:
        self.file, self.n_rows = file, n_rows


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlManifestDataSource)

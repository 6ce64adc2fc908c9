"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``).

The reference ingests work by listing an S3 prefix and fanning file
names out over SQS consumers (`SendJobs.py:38-48`, `GetJobs.py:67-76`);
the Spark-native analog of "a source the engine doesn't ship" is the
Python Data Source API: declare a schema, plan explicit input
partitions, and stream Arrow-friendly tuples per partition.  This
module provides a deterministic synthetic event generator as that
custom source — the plumbing (registration, partition planning,
per-partition readers, option handling) is the operator; the payload
is arithmetic chosen to be exactly reproducible in ANSI SQL so the
driver's DuckDB oracle can audit a full scan.

Scale: ``partitions()`` returns one split per requested partition —
readers are independent, carry no shared state, and never touch the
driver after planning, so the source parallelizes like any file scan
(a real deployment would put one blob/manifest-shard per partition).
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamWriter,
                                    InputPartition)

# Modular-hash payload: id * MULT % MOD stays inside int64 for any
# id < 2^32 and is a plain arithmetic expression in any SQL engine.
MULT = 2654435761
MOD = 1000003


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SynthEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 4))
        # arrow=true switches read() to yield pyarrow RecordBatches —
        # the columnar fast path of the same API: one batch per
        # partition built vectorized in numpy, no per-row Python
        # tuples on the wire.
        self.arrow = str(options.get("arrow", "false")).lower() == "true"

    def partitions(self) -> list[RangePartition]:
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [RangePartition(lo, min(lo + per, self.n_rows))
                for lo in range(0, self.n_rows, per)]

    def read(self, partition: RangePartition):
        if self.arrow:
            import numpy as np
            import pyarrow as pa
            ids = np.arange(partition.start, partition.end,
                            dtype=np.int64)
            v = (ids * MULT) % MOD
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()),
                 pa.array((v % 16).astype(np.int32), pa.int32()),
                 pa.array(v, pa.int64())],
                names=["id", "bucket", "value"])
            return
        for i in range(partition.start, partition.end):
            v = (i * MULT) % MOD
            yield (i, v % 16, v)


class SynthEventsSource(DataSource):
    """``spark.read.format("synth_events").option("n_rows", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return "id bigint, bucket int, value bigint"

    def reader(self, schema) -> SynthEventsReader:
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthEventsStreamReader(self.options)

    def streamWriter(self, schema, overwrite):
        return JsonDirWriter(self.options)


def register(spark) -> None:
    """Idempotent registration on any (vanilla) session.  The class
    is pickled by reference, so ship the package to the workers
    first (same mechanism every UDF path uses).  The STREAMING
    reader additionally runs in a driver-side StreamingPythonRunner
    process that does NOT see addPyFile paths — register this module
    for pickle-BY-VALUE so that process needs no import at all."""
    from pyspark import cloudpickle

    from ..session import ship_package
    ship_package(spark)
    import samplebatchprocessing_spark.operators.pysource as _self
    cloudpickle.register_pickle_by_value(_self)
    spark.dataSource.register(SynthEventsSource)


class SynthEventsStreamReader:
    """``SimpleDataSourceStreamReader`` for the same synthetic
    relation — the STREAMING half of the Python Data Source API
    (Spark 4): offsets are plain row positions, each micro-batch
    advances by ``chunk`` rows until ``n_rows`` is exhausted, and
    ``readBetweenOffsets`` replays any committed span exactly (the
    recovery contract).  Deterministic payload -> the finite stream
    drains under AvailableNow and the result is auditable by the
    same arithmetic oracle as the batch scan."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.chunk = int(options.get("chunk", 128))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    @staticmethod
    def _rows(lo: int, hi: int):
        # iter(list), not a bare generator or list: the wrapper both
        # calls next() on the result (empty-batch validation) and
        # pickles it into the prefetch cache — a list_iterator
        # satisfies both, a generator fails pickling and a list
        # fails next().
        return iter([(i, (i * MULT) % MOD % 16, (i * MULT) % MOD)
                     for i in range(lo, hi)])

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.chunk, self.n_rows)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["pos"], end["pos"])

    def commit(self, end: dict) -> None:
        pass


class JsonDirWriter(DataSourceStreamWriter):
    """``DataSourceStreamWriter`` for the synthetic source — the SINK
    half of the Python Data Source API: each micro-batch task writes
    its rows as JSON lines under ``path``, returns a commit message
    naming the file, and ``commit`` journals the batch's file list —
    the same manifest-commit discipline as the P8 pipeline.  Local
    paths serve the local[?] test contract; a cluster deployment
    points ``path`` at shared/object storage."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid
        from pyspark.sql.datasource import WriterCommitMessage

        rows = [{"id": r[0], "bucket": r[1], "value": r[2]}
                for r in iterator]
        if not rows:
            return WriterCommitMessage()
        fn = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        with open(fn, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")
        msg = WriterCommitMessage()
        msg.file = fn
        msg.n = len(rows)
        return msg

    def commit(self, messages, batchId) -> None:
        import json
        import os
        files = [{"file": m.file, "n": m.n} for m in messages
                 if getattr(m, "file", None)]
        log = os.path.join(self.path, f"_commit_{batchId}.json")
        with open(log, "w") as fh:
            json.dump(files, fh)

    def abort(self, messages, batchId) -> None:
        pass

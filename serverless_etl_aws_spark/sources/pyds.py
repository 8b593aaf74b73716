"""Custom Python Data Source (PySpark 4 `pyspark.sql.datasource` API).

The engine's pattern for ingesting systems Spark has no connector for
(paginated REST APIs, proprietary stores, message logs): implement
``DataSource`` + ``DataSourceReader`` in Python, plan N ``InputPartition``s
driver-side, and each executor reads ONLY its partition — parallel,
restartable at partition granularity, no driver bottleneck. This
generalizes the reference's single-threaded Lambda downloader
(reference: src/lambda_functions/fetch_raw_data.py — one HTTP fetch per
invocation, fan-out delegated to EventBridge) into source-side parallelism
the cluster schedules itself.

The demo source is deterministic (id + md5 content hash over a
partitioned id range) so the DuckDB oracle can replay it exactly; a real
integration swaps ``read``'s body for the API/page fetch while partition
planning, schema declaration and option plumbing stay identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class RangeHashDataSource(DataSource):
    """``spark.read.format("range_hash").option("n", ...).option("parts", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "range_hash"

    def schema(self) -> str:
        return "id bigint, part int, h string"

    def reader(self, schema) -> "RangeHashReader":
        return RangeHashReader(
            n=int(self.options.get("n", 1000)),
            parts=int(self.options.get("parts", 4)),
        )


class _RangePartition(InputPartition):
    def __init__(self, index: int):
        self.index = index


class RangeHashReader(DataSourceReader):
    def __init__(self, n: int, parts: int):
        self.n = n
        self.parts = parts

    def partitions(self):
        # Driver-side partition PLANNING only — no data is touched here.
        # Each partition owns a contiguous id stride; an executor task
        # calls read() with exactly one of these.
        return [_RangePartition(i) for i in range(self.parts)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        # Runs ON THE EXECUTOR for one partition: the parallel unit a
        # real connector uses for one API page range / shard / segment.
        i = partition.index
        for vid in range(i, self.n, self.parts):
            h = hashlib.md5(str(vid).encode("ascii")).hexdigest()
            yield (vid, i, h)


class RangeStreamDataSource(DataSource):
    """Custom STREAMING Python data source (``simpleStreamReader``): a
    deterministic bounded counter stream — offsets are ``{"pos": k}``,
    each micro-batch advances by ``batch`` ids until ``n``. The pattern
    for streaming systems Spark has no connector for (message logs,
    change feeds): offset bookkeeping lives in the checkpoint, replay
    goes through ``readBetweenOffsets`` (exactly-once across restarts).
    """

    @classmethod
    def name(cls) -> str:
        return "range_stream"

    def schema(self) -> str:
        return "id bigint"

    def simpleStreamReader(self, schema) -> "RangeStreamReader":
        return RangeStreamReader(
            n=int(self.options.get("n", 5000)),
            batch=int(self.options.get("batch", 1000)),
        )


class RangeStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, n: int, batch: int):
        self.n = n
        self.batch = batch

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        if pos >= self.n:
            return iter([]), {"pos": pos}
        end = min(pos + self.batch, self.n)
        return iter([(i,) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Deterministic replay of a committed-but-lost batch — the
        # exactly-once contract under restart.
        return iter([(i,) for i in range(start["pos"], end["pos"])])


# Pickle this module BY VALUE. ``spark.dataSource.register()``
# serializes the DataSource CLASS, which default-pickles by REFERENCE —
# the spawned planner/worker Python processes must then
# ``import serverless_etl_aws_spark``, which only succeeds when the
# driver's cwd (or PYTHONPATH) happens to contain the repo. Found by
# the round-10 drift probes (driver run with cwd=/tmp: every
# registration died with ModuleNotFoundError wrapped in
# PYTHON_DATA_SOURCE_ERROR, while the same key passed from the repo
# root). By-value registration ships the class definitions inside the
# pickle, making the source self-contained wherever the driver runs
# from — the portability a real connector needs.
try:
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover — older cloudpickle without the API
    pass

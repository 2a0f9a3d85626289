"""Custom connector via the Spark 4 Python DataSource API: a
deterministic synthetic events source, batch AND micro-batch streaming.

Why it exists: the reference's source tier is object-store CSV put/list
(SURVEY.md §2.1 S12, scoped out as pre-engine); the engine-side
equivalent capability is "plug a new source format/system into
spark.read". The Python DataSource API is the idiomatic Spark-4 way to
do that without a JVM jar, and this module exercises the full surface:
``partitions()`` planning (split count drives task parallelism),
per-partition generators, options, and the streaming reader protocol
(``initialOffset``/``latestOffset``/``partitions(start, end)``/
``commit``).

Determinism: every row derives from md5 folds of (seed, partition,
row-index) — same rows on any engine, any retry, any executor count,
which is what makes the source usable in correctness tests and
load-generation benches (a Python-side twin of the rows the driver's
parquet fixtures follow).

Scale note: generation is embarrassingly parallel (one generator per
InputPartition, no coordination); reading Python-generated rows costs
an Arrow hop per batch, so this source is for testing/load-gen, not a
production scan path — production data arrives via the parquet/CSV/
NDJSON/ORC readers (sources/readers.py).
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["SyntheticEventsDataSource", "register_synthetic_source"]

_EVENT_TYPES = ("view", "click", "purchase", "remove_from_cart", "signup")
_EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _fold(*parts: int) -> int:
    """Deterministic 64-bit fold of the given integers (md5-based, like
    the similarity plane generator — stable across Python builds)."""
    key = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(key).digest()[:8], "big")


def _row(seed: int, part: int, i: int, users: int):
    h = _fold(seed, part, i)
    event_id = part * 1_000_000_000 + i
    ts = _EPOCH + dt.timedelta(seconds=h % (30 * 24 * 3600))
    user_id = (h >> 32) % users
    etype = _EVENT_TYPES[(h >> 16) % len(_EVENT_TYPES)]
    value = round(((h >> 8) % 50_000) / 100.0, 2)
    props = '{"k": %d}' % (h % 100)
    return (event_id, ts, user_id, etype, value, props)


class _Part(InputPartition):
    def __init__(self, idx: int):
        self.idx = idx


class _Reader(DataSourceReader):
    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("partitions", 4))
        self.rows_per_part = int(options.get("rows_per_partition", 1000))
        self.users = int(options.get("users", 100))

    def partitions(self):
        return [_Part(i) for i in range(self.n_parts)]

    def read(self, partition: _Part):
        for i in range(self.rows_per_part):
            yield _row(self.seed, partition.idx, i, self.users)


class _StreamReader(DataSourceStreamReader):
    """Micro-batch protocol: offset = monotonically increasing batch
    number; every batch materializes ``rows_per_batch`` deterministic
    rows split over ``partitions`` input splits. ``latestOffset``
    advances one batch per trigger up to ``max_batches`` (bounded so
    availableNow triggers terminate in tests)."""

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("partitions", 2))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.users = int(options.get("users", 100))
        self.max_batches = int(options.get("max_batches", 3))
        self._latest = 0

    def initialOffset(self):
        return {"batch": 0}

    def latestOffset(self):
        if self._latest < self.max_batches:
            self._latest += 1
        return {"batch": self._latest}

    def partitions(self, start: dict, end: dict):
        return [
            _Part(b * self.n_parts + p)
            for b in range(start["batch"], end["batch"])
            for p in range(self.n_parts)
        ]

    def read(self, partition: _Part):
        per_part = self.rows_per_batch // self.n_parts
        for i in range(per_part):
            yield _row(self.seed, partition.idx, i, self.users)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — the generator is stateless


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _Reader:
        return _Reader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)

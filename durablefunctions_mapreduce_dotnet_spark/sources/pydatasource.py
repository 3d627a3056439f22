"""Custom Python Data Source (PySpark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic taxi-trips generator.

The reference's entire source layer is a hand-rolled connector — blob
listing + an HTTP CSV stream read line-at-a-time inside the mapper
(``Sample.cs:109-151``).  Spark's answer to "my data lives behind a
custom protocol" is the DataSource API: declare a schema, plan input
partitions, and yield rows per partition; the engine owns scheduling,
retries, and column pruning above it.  This module implements that
surface end-to-end with a generator source, so the engine demonstrably
supports third-party connectors without JVM code.

Scale semantics match any sane connector:

* ``partitions()`` is the split-planning hook — one ``InputPartition``
  per parallel read unit (the analogue of one blob per mapper in the
  reference, or one byte-range per task in a real file source).
* ``read(partition)`` runs ON THE EXECUTOR, yields tuples for just its
  split, and holds no cross-partition state — rows are generated
  (deterministically, from the partition id + row index via the same
  multiplicative-hash family as operators.curation) without the driver
  ever touching data.

Determinism contract: every (partition, row) pair maps to one fixed
record, so re-reads, task retries, and different executor placements
produce identical tables — the property Spark's fault tolerance
assumes of any source.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_KNUTH = 2654435761
_MOD = 4294967296


def _h(x: int) -> int:
    """Portable multiplicative hash (same family as curation.hash_bucket)."""
    return (x * _KNUTH) % _MOD


class SyntheticTripsDataSource(DataSource):
    """``spark.read.format("synthetic_trips")`` after registration.

    Options:
      ``partitions``          number of input splits (default 8)
      ``rows_per_partition``  rows generated per split (default 1000)
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_trips"

    def schema(self) -> str:
        return (
            "vendor_id int, pickup_ts timestamp, dropoff_ts timestamp, "
            "trip_distance double, file_id int"
        )

    def reader(self, schema) -> "SyntheticTripsReader":
        return SyntheticTripsReader(
            int(self.options.get("partitions", 8)),
            int(self.options.get("rows_per_partition", 1000)),
        )

    def simpleStreamReader(self, schema) -> "SyntheticTripsStreamReader":
        """The STREAMING face of the same connector: deterministic
        micro-batches with replayable offsets (``spark.readStream
        .format("synthetic_trips")``)."""
        return SyntheticTripsStreamReader(
            int(self.options.get("rows_per_batch", 200)),
            int(self.options.get("max_batches", 3)),
        )


class SyntheticTripsReader(DataSourceReader):
    def __init__(self, n_partitions: int, rows_per_partition: int) -> None:
        self._n = n_partitions
        self._rows = rows_per_partition

    def partitions(self):  # split planning (driver-side, metadata only)
        return [InputPartition(i) for i in range(self._n)]

    def read(self, partition):  # executor-side generator for ONE split
        import datetime as dt

        pid = partition.value
        base = dt.datetime(2017, 1, 1)
        for i in range(self._rows):
            g = _h(pid * 1_000_003 + i)
            pickup = base + dt.timedelta(minutes=(g % 525_600))
            duration_s = 60 + (g >> 8) % 5400
            dropoff = pickup + dt.timedelta(seconds=duration_s)
            distance = round(0.1 + ((g >> 4) % 3000) / 100.0, 2)
            vendor = 1 + (g % 2)
            yield (vendor, pickup, dropoff, distance, pid)


def register(spark) -> None:
    """Idempotent registration: ``spark.dataSource.register``."""
    spark.dataSource.register(SyntheticTripsDataSource)


class SyntheticTripsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader for the same synthetic trips: each trigger
    emits one deterministic batch (offset = batch index) until
    ``max_batches``, then reports no new data — so a synchronous
    ``processAllAvailable()`` drain terminates.

    Offsets are the engine's exactly-once contract: the checkpoint
    stores the dict we return, and a restarted query re-enters ``read``
    at the committed offset — because (batch, row) → record is a pure
    function, replays regenerate identical data (the same property a
    Kafka offset or file position gives a real connector).
    """

    def __init__(self, rows_per_batch: int, max_batches: int) -> None:
        self._rows = rows_per_batch
        self._max = max_batches

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict):
        b = start["batch"]
        if b >= self._max:
            return iter([]), {"batch": b}
        # a LIST-backed iterator, not a generator: the engine's
        # prefetch cache copies the returned iterator for offset
        # replay, and generators can't be copied — list iterators can
        # (batches are small by contract: one trigger's worth)
        return iter(list(self._gen(b))), {"batch": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: regenerate [start, end)
        for b in range(start["batch"], end["batch"]):
            yield from self._gen(b)

    def _gen(self, b: int):
        import datetime as dt

        base = dt.datetime(2017, 1, 1)
        for i in range(self._rows):
            g = _h(b * 1_000_003 + i)
            pickup = base + dt.timedelta(minutes=(g % 525_600))
            duration_s = 60 + (g >> 8) % 5400
            yield (
                1 + (g % 2),
                pickup,
                pickup + dt.timedelta(seconds=duration_s),
                round(0.1 + ((g >> 4) % 3000) / 100.0, 2),
                b,
            )

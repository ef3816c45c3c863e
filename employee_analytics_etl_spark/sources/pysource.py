"""Custom PYTHON DATA SOURCE (Spark 4 ``pyspark.sql.datasource``
API): the engine's extension point for sources Spark has no built-in
reader for — internal manifest services, bespoke binary feeds,
synthetic generators. Registered once per session
(``spark.dataSource.register``) and then addressable as a normal
``spark.read.format(...)`` with options, schema, and PARTITIONED
reads (each partition is planned on the driver and read
independently by executors — the same parallel-scan contract as the
built-in file sources).

Implementation here: a deterministic synthetic-sequence source
("seqgen") emitting (id, bucket, value) rows split across N
partitions by contiguous id ranges — the scale shape a 100 TB custom
feed needs (planner emits ranges, workers stream their own slice;
no driver materialization). Used by tests as the reference
implementation of the API; real feeds swap the row generator for
their protocol client.

Reference parity: the reference reads only CSV/MySQL (extract.py);
this is the Spark-idiomatic escape hatch for every source beyond
that list.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SeqGenReader(DataSourceReader):
    def __init__(self, schema, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("num_partitions", 4))
        self.n_buckets = int(options.get("n_buckets", 10))

    def partitions(self):
        # contiguous id ranges — planned driver-side, read worker-side
        per = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition):
        # deterministic rows from the id alone — no state, no RPC;
        # a real source would stream its protocol client here
        for i in range(partition.start, partition.end):
            yield (i, f"b{i % self.n_buckets}", float(i % 97) / 10.0)


class SeqGenDataSource(DataSource):
    @classmethod
    def name(cls):
        return "seqgen"

    def schema(self):
        return StructType(
            [
                StructField("id", LongType(), False),
                StructField("bucket", StringType(), False),
                StructField("value", DoubleType(), False),
            ]
        )

    def reader(self, schema):
        return SeqGenReader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the custom source on a session."""
    spark.dataSource.register(SeqGenDataSource)

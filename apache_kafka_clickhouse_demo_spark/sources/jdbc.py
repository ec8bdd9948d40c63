"""JDBC scan — the source sibling of `streaming.pipeline.jdbc_sink` (the
north star names "Structured Streaming with Kafka source + JDBC sink",
BASELINE.json; real deployments also read dimension/config tables back out
of the relational side, so the engine exposes both directions).

Scale design: a bare `spark.read.jdbc(url, table)` is ONE connection and
ONE partition — a single executor pulls the whole table, the classic JDBC
bottleneck.  `jdbc_table` makes the partitioned form the first-class path:
given a numeric `partition_column` and bounds, Spark issues
`num_partitions` range-bounded queries in parallel, and Catalyst pushes
projections and filters into each query (visible as PushedFilters in the
scan node).  Bounds are caller-provided — deriving them with a MIN/MAX
probe query is one extra round-trip some warehouses price dearly; callers
usually know the key range (or read it from table stats).

Keep `num_partitions` within the database's connection budget: at cluster
scale an unbounded executor fan-in is how relational sources fall over
(same caveat as jdbc_sink, mirrored on purpose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read a JDBC table (or `(subquery) alias`) as a DataFrame.

    With `partition_column` + bounds + `num_partitions`, the scan is split
    into parallel range queries (the only JDBC shape that survives large
    tables); without them it is a single-connection read, acceptable only
    for small dimension tables (document the choice at the call site).
    """
    partition_args = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(a is not None for a in partition_args) and any(
        a is None for a in partition_args
    ):
        raise ValueError(
            "partition_column, lower_bound, upper_bound, num_partitions "
            "must be given together"
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()

"""Scale-safe deterministic global indexing.

A bare ``row_number() OVER (ORDER BY ...)`` moves the ENTIRE input to one
partition (Spark warns: "No Partition Defined for Window operation") — fine
for a ≤k top-k tail, fatal for a corpus-sized frame. :func:`dense_index`
computes the same dense 0-based global rank in two scale-safe phases:

1. range-repartition on the order key, so partition *i* holds only keys that
   sort before partition *i+1*'s;
2. per-partition ``row_number`` (a partitioned window — no single-partition
   shuffle) plus an exclusive prefix sum of the per-partition counts.

The per-partition counts are one tiny aggregate (≤ ``shuffle.partitions``
rows) collected to the driver; driver state is O(partitions), not O(rows).

Determinism: the range partitioner samples, so PARTITION BOUNDARIES vary run
to run — but when the order key is unique, a row's final index equals the
number of keys sorting before it, which no boundary placement can change.
Callers must therefore pass a key that is unique per row (append a tiebreak
column if needed); uniqueness is what makes the index reproducible under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dense_index(
    df: DataFrame, order_cols: list[str], name: str = "_idx"
) -> DataFrame:
    """Append a deterministic dense 0-based global index ordered by
    ``order_cols`` (which must be unique per row — see module docstring).

    The input is materialized once (eager localCheckpoint) because the plan
    is consumed twice: once for the per-partition counts, once for the
    indexed output. The checkpoint also pins the partitioning so the counts
    and the window see identical partitions.
    """
    parted = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("_di_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parted.groupBy("_di_pid").count().collect()
    offsets: list = []
    acc = 0
    for row in sorted(counts, key=lambda r: r["_di_pid"]):
        offsets.extend([F.lit(row["_di_pid"]), F.lit(acc)])
        acc += row["count"]
    if not offsets:  # empty input: no map literal to build
        return df.withColumn(name, F.lit(None).cast("long"))
    offset_of = F.create_map(*offsets)
    w = Window.partitionBy("_di_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        parted.withColumn(
            name,
            (offset_of[F.col("_di_pid")] + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_di_pid")
    )

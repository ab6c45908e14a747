"""Scalable sequence packing: global prefix sums without a global window.

`pack_sequences_chunked` (plans/training_queries.py) computes the running
token offset with `Window.orderBy(doc_id)` — semantically exact but a
single-partition sort at scale. This module implements the 100 TB shape
of the SAME computation:

1. range-repartition by doc_id and sort within partitions (a distributed
   sort — each partition holds a contiguous doc_id range);
2. one tiny aggregate: token subtotal per partition id;
3. driver-side exclusive prefix sum over the per-partition subtotals
   (one row per partition — kilobytes at any scale);
4. broadcast the partition base offsets back and add them to the
   per-partition running sums (window partitioned BY partition id — no
   cross-partition shuffle, full parallelism).

The result is bit-identical to the global-window version (asserted by a
differential test), because range partitioning + in-partition order is
exactly the global doc_id order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def running_offsets_scalable(sized: DataFrame, id_col: str = "doc_id",
                             size_col: str = "n_tokens",
                             n_partitions: int | None = None) -> DataFrame:
    """Add ``start_offset`` = exclusive running sum of ``size_col`` in
    global ``id_col`` order, computed with per-partition windows only.
    """
    parts = sized.repartitionByRange(
        *( [n_partitions] if n_partitions else [] ), F.col(id_col)
    ).sortWithinPartitions(id_col).withColumn("__pid", F.spark_partition_id())

    # One row per partition: (pid, subtotal). Collected to the driver —
    # this is the only driver-side data and it is O(#partitions).
    subtotals = {
        r["__pid"]: r["subtotal"]
        for r in parts.groupBy("__pid").agg(F.sum(size_col).alias("subtotal")).collect()
    }
    base, acc = {}, 0
    for pid in sorted(subtotals):
        base[pid] = acc
        acc += subtotals[pid]
    base_df = parts.sparkSession.createDataFrame(
        [(pid, b) for pid, b in base.items()], "__pid int, __base long"
    )

    w = Window.partitionBy("__pid").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        parts.join(F.broadcast(base_df), "__pid")
        .withColumn(
            "start_offset",
            (F.sum(size_col).over(w) - F.col(size_col) + F.col("__base")).cast("long"),
        )
        .drop("__pid", "__base")
    )

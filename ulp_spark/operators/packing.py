"""Sequence packing: assign every tokenized document its global token
offset, so fixed-length training chunks can be cut deterministically —
the step between "deduped corpus" and "training batches" in an LLM data
pipeline (operates on the BASELINE.json input_hint table
``(doc_id, tokens, n_tok, source)``).

The core is a DISTRIBUTED GLOBAL CUMULATIVE SUM.  A naive
``Window.orderBy(key)`` with no partition key collapses the whole table
into ONE task — the classic single-reducer trap.  The scalable shape is
the two-phase prefix sum every parallel-scan paper uses:

    1. range-partition by the order key (so partition i holds keys < all
       of partition i+1's);
    2. local cumulative sum inside each partition (window partitioned by
       ``spark_partition_id()`` — streams, never buffers);
    3. per-partition totals (tiny aggregate) -> driver prefix -> joined
       back as a broadcast base offset.

Wall-clock is two narrow passes + one KiB collect; no single task ever
sees more than one partition.  Results are EXACT and independent of the
partition count, so the DuckDB twin is a plain window cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK = 512  # training sequence length (tokens)


def global_cumsum(
    df: DataFrame, order_col: str, val_col: str,
    out_col: str = "tok_offset", partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = exclusive prefix sum of ``val_col`` in
    ``order_col`` order (i.e. the global offset where this row starts)."""
    from pyspark.sql import Window

    n_part = partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint freezes the range partitioning: the totals pass and
    # the final pass are separate ACTIONS, and AQE may re-plan the shuffle
    # differently per action — spark_partition_id would then disagree
    # between the two (observed: constant per-partition offset drift).
    # Materializing once is the same cost/shape as the pipeline's S5 seam.
    ranged = (
        df.repartitionByRange(n_part, F.col(order_col))
        .localCheckpoint()
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = ranged.withColumn(
        "__local_end", F.sum(F.col(val_col).cast("bigint")).over(w))
    # per-partition total via sum(val), NOT max(running sum): they agree
    # only for non-negative values, and this is a general prefix sum
    totals = {
        r["__pid"]: r["total"]
        for r in local.groupBy("__pid")
        .agg(F.sum(F.col(val_col).cast("bigint")).alias("total")).collect()
    }
    base, prefix = 0, {}
    for pid in sorted(totals):
        prefix[pid] = base
        base += totals[pid]
    base_col = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(prefix)]),
            F.array(*[F.lit(prefix[p]) for p in sorted(prefix)]),
        ),
        F.col("__pid"),
    )
    return (
        local.withColumn(
            out_col,
            (base_col + F.col("__local_end")
             - F.col(val_col).cast("bigint")).cast("bigint"))
        .drop("__pid", "__local_end")
    )


def packing_offsets(
    df: DataFrame, order_col: str = "doc_id", len_col: str = "n_tok",
    chunk: int = CHUNK,
) -> DataFrame:
    """Per document: global start offset, first chunk id, and how many
    ``chunk``-token training sequences it touches."""
    out = global_cumsum(df, order_col, len_col, out_col="tok_offset")
    start, length = F.col("tok_offset"), F.col(len_col).cast("bigint")
    first = F.floor(start / chunk)
    last = F.floor((start + length - 1) / chunk)
    return out.select(
        order_col, len_col, "tok_offset",
        first.cast("bigint").alias("first_chunk"),
        (last - first + 1).cast("bigint").alias("n_chunks"),
    )


def packing_offsets_sql(
    table: str, order_col: str = "doc_id", len_col: str = "n_tok",
    chunk: int = CHUNK,
) -> str:
    """DuckDB twin: plain window cumsum (single node — the point of the
    Spark version is precisely NOT doing it this way)."""
    return f"""
    WITH c AS (
      SELECT {order_col}, {len_col},
             (sum({len_col}) OVER (ORDER BY {order_col})
              - {len_col})::BIGINT AS tok_offset
      FROM {table}
    )
    SELECT {order_col}, {len_col}, tok_offset,
           CAST(floor(tok_offset / {chunk}) AS BIGINT) AS first_chunk,
           CAST(floor((tok_offset + {len_col} - 1) / {chunk})
                - floor(tok_offset / {chunk}) + 1 AS BIGINT) AS n_chunks
    FROM c
    """

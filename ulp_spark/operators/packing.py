"""Sequence packing: assign every tokenized document its global token
offset, so fixed-length training chunks can be cut deterministically —
the step between "deduped corpus" and "training batches" in an LLM data
pipeline (operates on the BASELINE.json input_hint table
``(doc_id, tokens, n_tok, source)``).

The core is a DISTRIBUTED GLOBAL CUMULATIVE SUM.  A naive
``Window.orderBy(key)`` with no partition key collapses the whole table
into ONE task — the classic single-reducer trap.  The scalable shape is
the two-phase prefix sum every parallel-scan paper uses:

    1. bucket rows by a DATA-DERIVED range id ``__pid`` (sampled key
       boundaries -> monotone bucket expression), so bucket i holds keys
       < all of bucket i+1's;
    2. local cumulative sum inside each bucket (window partitioned by
       ``__pid`` — streams, never buffers);
    3. per-bucket totals (tiny aggregate) -> driver prefix -> joined
       back as a broadcast base offset.

Round-4 redesign (VERDICT r3 #7): the previous version stamped
``spark_partition_id()`` on a ``repartitionByRange`` + localCheckpoint,
which cost TWO full-data exchanges — the range shuffle, then a second
hash exchange for the window because the checkpointed RDD reports
UnknownPartitioning.  Deriving ``__pid`` from the DATA (like Spark's own
RangePartitioner: sample keys, pick boundaries, bucket by comparison)
makes the id deterministic across actions with no checkpoint and no
range shuffle: the totals pass is a map-side-combined aggregate whose
exchange carries ``n_part`` rows, and the final pass pays the ONE
full-data exchange the window genuinely needs.  Boundary quality only
affects load balance, never correctness — any monotone bucketing yields
the exact prefix sum.  Driver memory is O(n_part * 100) sampled keys.

Wall-clock is two narrow passes + two KiB collects; no single task ever
sees more than one bucket.  Results are EXACT and independent of the
input partitioning, so the DuckDB twin is a plain window cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK = 512  # training sequence length (tokens)


def _range_boundaries(
    df: DataFrame, order_col: str, n_part: int, per_part: int = 100,
    seed: int = 7,
) -> list:
    """Sampled split points for a monotone ``n_part``-way bucketing of
    ``order_col`` (ascending, deduplicated).  Empty list -> one bucket."""
    if n_part <= 1:
        return []
    n = df.count()
    if n == 0:
        return []
    frac = min(1.0, (n_part * per_part) / n)
    sample = sorted(
        r[0]
        for r in df.select(order_col).sample(False, frac, seed=seed).collect()
        if r[0] is not None
    )
    if not sample:
        return []
    step = len(sample) / n_part
    bounds: list = []
    for i in range(1, n_part):
        b = sample[min(len(sample) - 1, int(i * step))]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def global_cumsum(
    df: DataFrame, order_col: str, val_col: str,
    out_col: str = "tok_offset", partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = exclusive prefix sum of ``val_col`` in
    ``order_col`` order (i.e. the global offset where this row starts).

    ``__pid`` is a pure expression over ``order_col`` (bucket index
    against broadcast sorted boundaries), so the totals aggregate and the
    final window agree by construction — the AQE re-plan hazard that
    forced the old localCheckpoint cannot occur, and the plan's only
    full-data exchange is the window's hash partition by ``__pid``."""
    from pyspark.sql import Window

    n_part = partitions or df.sparkSession.sparkContext.defaultParallelism
    bounds = _range_boundaries(df, order_col, n_part)
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        # monotone bucket id: how many boundaries the key exceeds
        # (sorted bounds -> equivalent to a binary search; linear
        # higher-order scan over n_part-1 literals, JVM-side)
        pid = F.size(F.filter(barr, lambda b: F.col(order_col) > b))
    else:
        pid = F.lit(0)
    keyed = df.withColumn("__pid", pid)
    # per-bucket total via sum(val), NOT max(running sum): they agree
    # only for non-negative values, and this is a general prefix sum
    totals = {
        r["__pid"]: r["total"]
        for r in keyed.groupBy("__pid")
        .agg(F.sum(F.col(val_col).cast("bigint")).alias("total")).collect()
    }
    base, prefix = 0, {}
    for p in sorted(totals):
        prefix[p] = base
        base += totals[p]
    if not prefix:
        return keyed.withColumn(out_col, F.lit(None).cast("bigint")) \
            .drop("__pid")
    base_col = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(prefix)]),
            F.array(*[F.lit(prefix[p]) for p in sorted(prefix)]),
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = keyed.withColumn(
        "__local_end", F.sum(F.col(val_col).cast("bigint")).over(w))
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

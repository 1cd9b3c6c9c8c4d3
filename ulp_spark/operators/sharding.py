"""Training-shard assignment and writing: cut the packed corpus into
fixed-token-budget shards — the step that turns a deduped, packed corpus
into the files a trainer actually streams (operates on the BASELINE.json
input_hint table ``(doc_id, tokens, n_tok, source)``).

Shard id = global token start offset // shard_tokens, built on the same
distributed prefix sum as :mod:`packing` (range partition -> local cumsum
-> driver prefix of per-partition totals; no single-reducer window).  A
sequence straddling a budget boundary belongs to the shard its FIRST
token falls in, so real shard sizes are ``shard_tokens`` +- one max
sequence length — the standard Megatron-style snap, documented contract.

The writer partitions by shard (``partitionBy("shard")``): each shard is
an independent set of files a trainer node can claim, and the write
parallelism is the upstream partitioning, not the shard count.  The
manifest (one row per shard: sequence count, token count, doc range) is
the unit of resume/verification — the same role the fan-out manifest
plays for routed sinks (plans/manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ulp_spark.operators.packing import global_cumsum

SHARD_TOKENS = 1 << 20  # ~1M tokens per shard


def shard_assign(
    df: DataFrame, order_col: str = "doc_id", len_col: str = "n_tok",
    shard_tokens: int = SHARD_TOKENS,
) -> DataFrame:
    """Adds ``tok_offset`` (global start) and ``shard`` to every sequence."""
    out = global_cumsum(df, order_col, len_col, out_col="tok_offset")
    return out.withColumn(
        "shard", F.floor(F.col("tok_offset") / shard_tokens).cast("bigint"))


def shard_manifest(
    df: DataFrame, order_col: str = "doc_id", len_col: str = "n_tok",
    shard_tokens: int = SHARD_TOKENS,
) -> DataFrame:
    """One row per shard: (shard, n_seqs, n_tokens, first_doc, last_doc)."""
    assigned = shard_assign(df, order_col, len_col, shard_tokens)
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum(F.col(len_col).cast("bigint")).alias("n_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )


def shard_manifest_sql(
    table: str, order_col: str = "doc_id", len_col: str = "n_tok",
    shard_tokens: int = SHARD_TOKENS,
) -> str:
    """DuckDB twin (plain window cumsum — single node by design)."""
    return f"""
    WITH c AS (
      SELECT {order_col}, {len_col},
             (sum({len_col}) OVER (ORDER BY {order_col})
              - {len_col})::BIGINT AS tok_offset
      FROM {table}
    )
    SELECT CAST(floor(tok_offset / {shard_tokens}) AS BIGINT) AS shard,
           count(*)::BIGINT AS n_seqs,
           sum({len_col})::BIGINT AS n_tokens,
           min({order_col}) AS first_doc,
           max({order_col}) AS last_doc
    FROM c GROUP BY shard
    """


def write_shards(
    df: DataFrame, path: str, order_col: str = "doc_id",
    len_col: str = "n_tok", shard_tokens: int = SHARD_TOKENS,
    max_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Write the corpus as shard-partitioned parquet; returns the manifest.

    ``maxRecordsPerFile`` bounds individual file sizes inside a shard
    directory (file-size hygiene at 100 TB: a trainer wants many
    mid-sized files per shard, not one monolith per task)."""
    assigned = shard_assign(df, order_col, len_col, shard_tokens)
    (
        assigned.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
    written = df.sparkSession.read.parquet(path)
    return written.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum(F.col(len_col).cast("bigint")).alias("n_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )

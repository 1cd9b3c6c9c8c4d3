"""Token-array operators over the pre-tokenized sequence table
``(doc_id, tokens array<int32>, n_tok, source)`` — the BASELINE.json
input_hint shape.  Text-side dedup/decontamination (operators/dedup.py,
operators/curation.py) works on characters; these are the same pipeline
stages expressed directly on token ids, the form a training pipeline has
AFTER tokenization.

Everything is JVM expression-only (transform/slice/md5 inside whole-stage
codegen); the only shuffles are the groupBy on the fingerprint and the
broadcast semi-join against the (small) eval gram set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAM = 8  # contamination n-gram length, in tokens


def token_fingerprint(tokens: Column) -> Column:
    """md5 over the comma-joined token ids — one 128-bit key per sequence.

    Serialization is exact (int renders identically in Spark and DuckDB),
    so equal fingerprints <=> equal arrays up to md5 collision."""
    return F.md5(F.concat_ws(",", F.transform(tokens, lambda t: t.cast("string"))))


def token_fingerprint_sql(tokens: str) -> str:
    return f"md5(array_to_string({tokens}, ','))"


def sequence_exact_dedup(
    df: DataFrame, tokens_col: str, id_col: str
) -> DataFrame:
    """One survivor per identical token array: (fp, doc_id=min, dup_count).

    The token-level twin of dedup.exact_dedup — bitwise-identical
    sequences collapse no matter which documents produced them.  Shuffle
    moves (fp, id) only; the arrays never leave the scan stage."""
    return (
        df.select(token_fingerprint(F.col(tokens_col)).alias("fp"),
                  F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col),
             F.count(F.lit(1)).alias("dup_count"))
    )


def sequence_exact_dedup_sql(table: str, tokens_col: str, id_col: str) -> str:
    return f"""
        SELECT {token_fingerprint_sql(tokens_col)} AS fp,
               min({id_col}) AS {id_col},
               count(*)::BIGINT AS dup_count
        FROM {table} GROUP BY fp
    """


def token_grams(tokens: Column, k: int = GRAM) -> Column:
    """md5 keys of all consecutive ``k``-token windows (empty if shorter).

    Hashing each window keeps the join key 16 bytes regardless of k and
    sidesteps array-equality join keys on both engines."""
    n = F.size(tokens)
    windows = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda j: F.md5(F.concat_ws(",", F.transform(
                F.slice(tokens, j, k), lambda t: t.cast("string")))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return windows


def token_grams_sql(tokens: str, k: int = GRAM) -> str:
    return (
        f"[md5(array_to_string({tokens}[j:j+{k - 1}], ',')) "
        f"FOR j IN range(1, greatest(len({tokens}) - {k - 1}, 0) + 1)]"
    )


def token_contamination(
    df: DataFrame, tokens_col: str, id_col: str,
    eval_pred: Column, k: int = GRAM,
) -> DataFrame:
    """Flag train sequences sharing any token ``k``-gram with the eval
    split — decontamination AFTER tokenization, where an n-gram is an
    exact token-id window rather than a whitespace heuristic.

    Same scale shape as curation.contamination_flags: the eval side is
    tiny, its distinct gram keys broadcast, and the train corpus is never
    shuffled — one broadcast LEFT SEMI on the exploded grams, re-collapsed
    to one row per sequence.  Returns (id, is_contaminated) for TRAIN
    rows only."""
    grams = token_grams(F.col(tokens_col), k)
    sides = df.select(F.col(id_col), eval_pred.alias("is_eval"),
                      F.explode(grams).alias("gk"))
    eval_grams = sides.filter("is_eval").select("gk").distinct()
    train = sides.filter(~F.col("is_eval"))
    hits = (
        train.join(F.broadcast(eval_grams), "gk", "left_semi")
        .select(id_col).distinct()
        .withColumn("is_contaminated", F.lit(True))
    )
    train_ids = df.filter(~eval_pred).select(id_col)
    return train_ids.join(hits, id_col, "left").fillna(
        False, subset=["is_contaminated"])


def token_contamination_sql(
    table: str, tokens_col: str, id_col: str,
    eval_pred_sql: str, k: int = GRAM,
) -> str:
    grams = token_grams_sql(tokens_col, k)
    return f"""
        WITH sides AS (
          SELECT {id_col}, ({eval_pred_sql}) AS is_eval,
                 unnest({grams}) AS gk
          FROM {table}
        ),
        eval_g AS (SELECT DISTINCT gk FROM sides WHERE is_eval),
        hits AS (
          SELECT DISTINCT s.{id_col} FROM sides s
          JOIN eval_g USING (gk) WHERE NOT s.is_eval
        )
        SELECT t.{id_col},
               (h.{id_col} IS NOT NULL) AS is_contaminated
        FROM (SELECT {id_col} FROM {table} WHERE NOT ({eval_pred_sql})) t
        LEFT JOIN hits h USING ({id_col})
    """

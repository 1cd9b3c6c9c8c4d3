"""Linear quality-classifier INFERENCE over hashed n-gram features —
the fastText-style model-based filter stage (DCLM / FineWeb-Edu style)
that sits beside the surface-statistics scorer (textstats.quality_score):
score = sigmoid((bias + sum of per-feature weights) / SCALE) over hashed
word unigrams + bigrams (the hashing trick: feature -> md5 -> bucket in
[0, dim)).

Numeric determinism: weights are INTEGER centi-units, so the per-doc sum
is exact integer arithmetic in any aggregation order on any engine; the
single float op (sigmoid) happens once per document on an identical
integer, then rounds to 6 dp.  A float-weighted sum would depend on
Spark's partial-aggregation order and could flap last-bit vs the oracle.

Weights come either from a (bucket, w_centi) DataFrame (a TRAINED model;
broadcast join, the real-deployment shape) or, by default, from a
deterministic synthetic formula standing in for training (this repo
ships no labeled data; the formula keeps every gate value-checkable).

Scale shape: explode features -> pure-expression bucket/weight (or
broadcast weight join) -> one groupBy(id) sum.  The explode factor is
~2x the word count (unigrams + bigrams); the aggregate collapses
map-side.  No UDF, no collect, no global state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ulp_spark.operators.curation import (
    word_grams, word_grams_sql, word_tokens, word_tokens_sql)

HASH_DIM = 4096     # feature buckets
SCALE = 100.0       # centi-units -> logits
_MIX = 2654435761   # Knuth multiplicative constant (synthetic weights)


def feature_bucket(feature: Column, dim: int = HASH_DIM) -> Column:
    """Portable hashing trick: first 8 md5 hex digits -> int -> mod dim.
    (md5 is the repo's cross-engine hash; Spark conv(hex) == DuckDB
    '0x..'::BIGINT on the same digest.)"""
    return F.conv(F.substring(F.md5(feature), 1, 8), 16, 10) \
        .cast("bigint") % dim


def feature_bucket_sql(feature: str, dim: int = HASH_DIM) -> str:
    return f"(('0x' || substr(md5({feature}), 1, 8))::BIGINT % {dim})"


def synthetic_weight_centi(bucket: Column) -> Column:
    """Deterministic stand-in for trained weights: centi-units in
    [-500, 500].  Integer arithmetic end to end."""
    return (bucket * F.lit(_MIX)) % F.lit(1001) - F.lit(500)


def synthetic_weight_centi_sql(bucket: str) -> str:
    return f"((({bucket}) * {_MIX}) % 1001 - 500)"


def _features(text: Column) -> Column:
    toks = word_tokens(F.coalesce(text, F.lit("")))
    return F.concat(toks, word_grams(toks, 2))


def linear_quality_score(
    df: DataFrame, text_col: str, id_col: str, dim: int = HASH_DIM,
    weights: DataFrame | None = None, bias_centi: int = 0,
) -> DataFrame:
    """(id, score_centi, prob) — the classifier head.

    ``weights``: optional (bucket bigint, w_centi bigint) trained-model
    table; broadcast-joined on the hashed bucket (missing buckets weigh
    0).  Default: the synthetic formula — zero joins, pure expressions.
    Every input row comes back (empty/null text scores the bias alone).
    """
    feats = (
        df.select(F.col(id_col),
                  F.explode_outer(_features(F.col(text_col))).alias("f"))
        .select(id_col, feature_bucket(F.col("f"), dim).alias("bucket"))
    )
    if weights is None:
        weighted = feats.select(
            id_col,
            F.when(F.col("bucket").isNull(), F.lit(0))  # explode_outer pad
            .otherwise(synthetic_weight_centi(F.col("bucket")))
            .alias("w_centi"))
    else:
        weighted = (
            feats.join(F.broadcast(weights), "bucket", "left")
            .select(id_col,
                    F.coalesce(F.col("w_centi"), F.lit(0)).alias("w_centi"))
        )
    scored = weighted.groupBy(id_col).agg(
        (F.sum("w_centi") + F.lit(bias_centi)).cast("bigint")
        .alias("score_centi"))
    prob = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score_centi") / SCALE)), 6)
    return scored.select(id_col, "score_centi", prob.alias("prob"))


def linear_quality_score_sql(
    table: str, text_col: str, id_col: str, dim: int = HASH_DIM,
    bias_centi: int = 0,
) -> str:
    """DuckDB twin of the default (synthetic-weight) path."""
    toks = word_tokens_sql(f"coalesce({text_col}, '')")
    bucket = feature_bucket_sql("f", dim)
    return f"""
        WITH feats AS (
          SELECT {id_col},
                 unnest(list_concat({toks}, {word_grams_sql(toks, 2)})) AS f
          FROM {table}
        ),
        scored AS (
          SELECT {id_col},
                 sum({synthetic_weight_centi_sql(bucket)}) AS s
          FROM feats GROUP BY {id_col}
        )
        SELECT t.{id_col},
               (coalesce(sc.s, 0) + {bias_centi})::BIGINT AS score_centi,
               round(1.0 / (1.0 + exp(-(coalesce(sc.s, 0) + {bias_centi})
                                      / {SCALE})), 6) AS prob
        FROM (SELECT {id_col} FROM {table}) t
        LEFT JOIN scored sc USING ({id_col})
    """

"""Vocabulary / tokenizer-training statistics over a document corpus:
word-frequency top-k and BPE-style adjacent-character-pair counts.

These are the aggregations a tokenizer-training pipeline runs over the
full corpus before BPE merges can be chosen (Sennrich et al. 2016,
arXiv:1508.07909): exactly the "count every word, then count every
adjacent symbol pair weighted by word frequency" step.  Scale shape:

* the FIRST aggregation collapses the corpus to its vocabulary
  (``groupBy(word).count`` — map-side partial combine means each executor
  emits one row per distinct word it saw, not per occurrence); every
  later step runs at vocabulary scale, which is orders of magnitude
  smaller than corpus scale.
* pair extraction is array algebra on the distinct-word rows
  (``transform`` over a ``sequence`` of offsets), then one more
  combine-heavy ``groupBy(pair).sum``.
* top-k uses ``orderBy(...).limit(k)`` which Spark executes as
  TakeOrderedAndProject — per-partition heaps, no global sort.

Tokenization reuses curation.word_tokens (explicit whitespace class —
identical under Java regex and RE2/DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ulp_spark.operators.curation import (word_grams, word_tokens,
                                          word_tokens_sql)


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) corpus word frequencies — the vocabulary."""
    return (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    )


def word_counts_sql(table: str, text_col: str) -> str:
    return f"""
    SELECT w AS word, count(*)::BIGINT AS n
    FROM (SELECT unnest({word_tokens_sql(text_col)}) AS w FROM {table})
    GROUP BY w
    """


def vocab_topk(df: DataFrame, text_col: str, k: int = 50) -> DataFrame:
    """Top-``k`` words by frequency (ties -> lexicographically smaller)."""
    return (
        word_counts(df, text_col)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(k)
    )


def vocab_topk_sql(table: str, text_col: str, k: int = 50) -> str:
    return (f"SELECT word, n FROM ({word_counts_sql(table, text_col)}) "
            f"ORDER BY n DESC, word LIMIT {k}")


def _char_pairs(word: Column) -> Column:
    """All adjacent character pairs of ``word`` in order (len<2 -> empty):
    substr(word, i, 2) for i in 1..len-1."""
    n = F.length(word)
    return F.when(
        n >= 2,
        F.transform(F.sequence(F.lit(1), n - 1),
                    lambda i: word.substr(i, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))


def bpe_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(pair, n) adjacent-character-pair counts weighted by word frequency
    — the statistic argmaxed by each BPE merge step.  Pairs are counted
    per OCCURRENCE within a word (``aa`` in ``aaa`` counts twice), then
    weighted by how often the word occurs in the corpus."""
    wc = word_counts(df, text_col)
    return (
        wc.select("n", F.explode(_char_pairs(F.col("word"))).alias("pair"))
        .groupBy("pair").agg(F.sum("n").alias("n"))
    )


def bpe_pair_counts_sql(table: str, text_col: str) -> str:
    return f"""
    SELECT pair, sum(n)::BIGINT AS n
    FROM (
      SELECT n, unnest(list_transform(range(1, len(word)), i -> substr(word, i, 2))) AS pair
      FROM ({word_counts_sql(table, text_col)})
      WHERE len(word) >= 2
    )
    GROUP BY pair
    """


def bpe_top_merges(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Top-``k`` candidate BPE merges (ties -> lexicographically smaller
    pair), i.e. the first ``k`` greedy merge choices if pair statistics
    were frozen."""
    return (
        bpe_pair_counts(df, text_col)
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(k)
    )


def bpe_top_merges_sql(table: str, text_col: str, k: int = 20) -> str:
    return (f"SELECT pair, n FROM ({bpe_pair_counts_sql(table, text_col)}) "
            f"ORDER BY n DESC, pair LIMIT {k}")


# --------------------------------------------------------------------------
# bigram LM coverage (CCNet-style fluency signal, exact arithmetic)
# --------------------------------------------------------------------------

def bigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(gram, n) corpus word-bigram counts ("w1 w2" keys) — the model side
    of coverage scoring.  Same collapse-to-vocab-scale shape as
    word_counts."""
    toks = word_tokens(F.col(text_col))
    return (
        df.select(F.explode(word_grams(toks, 2)).alias("gram"))
        .groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    )


def bigram_counts_sql(table: str, text_col: str) -> str:
    from ulp_spark.operators.curation import word_grams_sql
    toks = word_tokens_sql(text_col)
    return f"""
    SELECT gram, count(*)::BIGINT AS n
    FROM (SELECT unnest({word_grams_sql(toks, 2)}) AS gram FROM {table})
    GROUP BY gram
    """


def bigram_coverage(
    df: DataFrame, text_col: str, id_col: str, min_count: int = 3,
) -> DataFrame:
    """Per-doc fluency signal: fraction of word-bigram OCCURRENCES whose
    corpus count is >= ``min_count`` (CCNet-style LM filtering with the
    perplexity model replaced by exact corpus statistics, so the score is
    integer-ratio-exact and oracle-gated; a real KenLM swap would only
    change the scoring UDF).

    Shape: docs explode to (doc_id, gram) -> ONE shuffle join against the
    vocab-scale bigram model on the gram key -> per-doc aggregate.  Docs
    with < 2 tokens keep a row (0 bigrams, 0.0 coverage) via the final
    left join.  Rounding: ratio of two bigints rounded to 6 dp — no
    float summation anywhere.
    """
    toks = word_tokens(F.col(text_col))
    grams = df.select(F.col(id_col), F.explode(word_grams(toks, 2))
                      .alias("gram"))
    model = bigram_counts(df, text_col)
    per_doc = (
        grams.join(model, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.sum((F.col("n") >= min_count).cast("bigint"))
              .alias("n_common"))
    )
    base = df.select(F.col(id_col))
    out = base.join(per_doc, id_col, "left")
    n_bi = F.coalesce("n_bigrams", F.lit(0)).cast("bigint")
    n_co = F.coalesce("n_common", F.lit(0)).cast("bigint")
    frac = F.when(n_bi == 0, F.lit(0.0)).otherwise(
        F.round(n_co.cast("double") / n_bi, 6))
    return out.select(id_col, n_bi.alias("n_bigrams"),
                      n_co.alias("n_common"), frac.alias("common_frac"))


def bigram_coverage_sql(
    table: str, text_col: str, id_col: str, min_count: int = 3,
) -> str:
    from ulp_spark.operators.curation import word_grams_sql
    toks = word_tokens_sql(text_col)
    return f"""
    WITH grams AS (
      SELECT {id_col}, unnest({word_grams_sql(toks, 2)}) AS gram
      FROM {table}
    ),
    model AS (
      SELECT gram, count(*)::BIGINT AS n FROM grams GROUP BY gram
    ),
    per_doc AS (
      SELECT g.{id_col}, count(*)::BIGINT AS n_bigrams,
             sum(CASE WHEN m.n >= {min_count} THEN 1 ELSE 0 END)::BIGINT
               AS n_common
      FROM grams g JOIN model m USING (gram)
      GROUP BY g.{id_col}
    )
    SELECT t.{id_col},
           coalesce(p.n_bigrams, 0)::BIGINT AS n_bigrams,
           coalesce(p.n_common, 0)::BIGINT AS n_common,
           CASE WHEN coalesce(p.n_bigrams, 0) = 0 THEN 0.0
                ELSE round(coalesce(p.n_common, 0)::DOUBLE
                           / p.n_bigrams, 6) END AS common_frac
    FROM {table} t LEFT JOIN per_doc p USING ({id_col})
    """

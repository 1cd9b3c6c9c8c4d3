"""Vocabulary tokenizer APPLY (text -> token ids) and its inverse — the
step between the text-side corpus (documents) and the token-side table
(doc_id, tokens, n_tok, source) that every other tokens.* operator
consumes.  vocab.py LEARNS vocabulary/merge statistics from a corpus;
this module APPLIES a finished vocabulary.

Algorithm: greedy longest-match (WordPiece-style inference without the
continuation-prefix convention): at each position take the longest
vocabulary piece matching; if none matches, emit ``unk_id`` and advance
one character.  This is NOT iterative BPE merge-rank application — for a
merge list learned by vocab.bpe_top_merges the greedy result can differ
from true BPE on adversarial vocabularies; greedy is what WordPiece/
unigram runtimes ship for inference and is deterministic given the piece
set, which is the property the oracle needs.

Why a Pandas UDF: the longest-match recurrence consumes a variable-length
prefix per step, so each output token depends on where the previous match
ended — not expressible as Catalyst column algebra over fixed offsets
(contrast token_grams, whose windows are position-independent).  This is
the repo's one DESIGNED Python hot path: mapInPandas over Arrow batches,
the vocabulary dict broadcast once per executor, zero shuffles, linear
scan per string (O(len * max_piece_len) dict probes).  ``detokenize`` is
the inverse and IS column-expressible — its default path is a broadcast
join + ordered re-assembly, JVM end to end.

The DuckDB twin (tokenize_sql) drives the same greedy recurrence with a
recursive CTE, so even this non-relational operator gets a full
value-level SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tokenize(
    df: DataFrame, text_col: str, id_col: str, vocab: list[str],
    unk_id: int = -1, lowercase: bool = True,
) -> DataFrame:
    """(id, tokens array<int>, n_tok) by greedy longest-match over
    ``vocab`` (piece i gets id i).  Null/empty text -> empty array.

    Scale shape: narrow map over Arrow batches — no shuffle, no driver
    collect; the vocab broadcast ships once per executor.  Partitioning
    and row order pass through untouched, so the output co-partitions
    with the input for whatever joins follow.
    """
    if not vocab:
        raise ValueError("vocab must be non-empty")
    if len(set(vocab)) != len(vocab):
        raise ValueError("vocab has duplicate pieces")
    if "" in vocab:
        raise ValueError("vocab may not contain the empty string")
    sc = df.sparkSession.sparkContext
    bvocab = sc.broadcast({p: i for i, p in enumerate(vocab)})
    max_len = max(len(p) for p in vocab)

    id_field = df.schema[id_col]
    schema = T.StructType([
        id_field,
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
    ])

    def run(batches):
        import pandas as pd

        v = bvocab.value
        for pdf in batches:
            toks = []
            for s in pdf[text_col]:
                if s is None:
                    toks.append([])
                    continue
                if lowercase:
                    s = s.lower()
                ids, i, n = [], 0, len(s)
                while i < n:
                    ln = min(max_len, n - i)
                    while ln > 0 and s[i:i + ln] not in v:
                        ln -= 1
                    if ln == 0:
                        ids.append(unk_id)
                        i += 1
                    else:
                        ids.append(v[s[i:i + ln]])
                        i += ln
                toks.append(ids)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "tokens": toks,
                "n_tok": [len(t) for t in toks],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def tokenize_sql(
    table: str, text_col: str, id_col: str, vocab: list[str],
    unk_id: int = -1, lowercase: bool = True,
) -> str:
    """DuckDB twin: the greedy recurrence as a recursive CTE.  One
    recursion step consumes one token (longest piece matching at the
    cursor via a correlated ORDER BY len DESC LIMIT 1); rows finish when
    the cursor passes the end.  Oracle-scale only — the point is value
    parity, not throughput."""
    # VALUES list with SQL escaping ('' for ')
    pieces = ", ".join(
        "({}, '{}')".format(i, p.replace("'", "''")) for i, p in enumerate(vocab))
    text = f"lower({text_col})" if lowercase else text_col
    return f"""
        WITH RECURSIVE v(tid, piece) AS (VALUES {pieces}),
        src AS (
          SELECT {id_col}, coalesce({text}, '') AS s FROM {table}
        ),
        step AS (
          SELECT {id_col}, s, 1 AS pos, CAST([] AS INT[]) AS ids FROM src
          UNION ALL
          SELECT {id_col}, s,
                 pos + coalesce(m.len, 1),
                 ids || [coalesce(m.tid, {unk_id})]
          FROM step LEFT JOIN LATERAL (
            SELECT v.tid, length(v.piece) AS len FROM v
            WHERE substr(step.s, step.pos, length(v.piece)) = v.piece
            ORDER BY length(v.piece) DESC, v.tid LIMIT 1
          ) m ON TRUE
          WHERE pos <= length(s)
        )
        SELECT {id_col}, ids AS tokens, len(ids)::INT AS n_tok
        FROM step WHERE pos > length(s)
    """


def detokenize(
    df: DataFrame, tokens_col: str, id_col: str, vocab: list[str],
    unk_piece: str = "�", via: str = "join",
) -> DataFrame:
    """(id, text): inverse of tokenize — concatenate each id's piece
    (ids outside [0, len(vocab)) render as ``unk_piece``).  Lossless for
    ids produced by tokenize with the same vocab and no unks; pinned as
    the roundtrip property in pytest.

    * ``via="join"`` (default): posexplode -> broadcast join against the
      (id -> piece) dim -> ordered re-assembly.  One corpus exchange (the
      groupBy), works for any vocab size, JVM end to end.
    * ``via="literal"``: the vocab as an array literal indexed by
      element_at — ZERO exchanges, but the literal is serialized into the
      plan, so it is for small vocabs (<= ~10k pieces); guarded.
    """
    if via == "literal":
        if len(vocab) > 10_000:
            raise ValueError(
                "via='literal' embeds the vocab in the plan; use "
                "via='join' for vocabularies this large")
        arr = F.array(*[F.lit(p) for p in vocab])
        piece = lambda t: F.coalesce(  # noqa: E731
            F.when((t >= 0) & (t < len(vocab)), F.element_at(arr, t + 1)),
            F.lit(unk_piece))
        return df.select(
            F.col(id_col),
            F.concat_ws("", F.transform(F.col(tokens_col), piece))
            .alias("text"),
        )
    if via != "join":
        raise ValueError(f"via must be 'join' or 'literal', got {via!r}")
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(i, p) for i, p in enumerate(vocab)], "tid int, piece string")
    ex = df.select(
        F.col(id_col),
        F.posexplode_outer(F.col(tokens_col)).alias("pos", "tid"))
    joined = ex.join(F.broadcast(dim), "tid", "left").select(
        id_col, "pos",
        F.coalesce(
            F.when(F.col("pos").isNotNull(), F.coalesce(
                F.col("piece"), F.lit(unk_piece))),
            F.lit("")).alias("piece"),
    )
    return (
        joined.groupBy(id_col)
        .agg(F.concat_ws("", F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "piece"))),
            lambda s: s["piece"])).alias("text"))
    )

"""P1/P2/S2 — vectorized log-line parsing with format detection.

Reference: per-record Rust loops turning EVTX/MFT binaries into flat JSON
(``src/evtx.rs:46-68``, ``src/mft.rs:54-78``) behind per-file format
detection by magic bytes (``src/lib.rs:58-72``).  Here the unit is a line
(or any string payload column) and both steps are Column expressions:

* detection = first matching pattern in a fixed-order registry (``rlike``
  cascade — the analog of the magic-byte sniff);
* extraction = ``regexp_extract`` per field, JVM-side and codegen'd.

Why not a pandas UDF: one compiled Java regex per (pattern, field) runs
inside whole-stage codegen with zero Python/Arrow transfer; profiling at
sf0.1 showed the built-in path beats an Arrow-batched ``re`` UDF for these
group counts.  ``parse_lines_pandas`` below keeps the UDF variant for
pattern sets too large for expression cascades (hundreds of grok rules),
where one Python pass with a combined regex wins.

No-match rows are NOT dropped: ``parser`` stays null and ``parse_error``
is set — the quarantine path (the reference panics on unknown formats,
``src/lib.rs:90``; we route to a quarantine sink instead, documented
deviation).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ulp_spark.functions import sniff


@dataclass(frozen=True)
class LogPattern:
    """One parse rule: ``fields[i]`` binds to regex group ``i+1``."""

    name: str
    regex: str
    fields: tuple[str, ...]


# The fixture dialect (FIXTURES.md T2) — the stand-in for the reference's
# EVTX/MFT parser pair (kv_provider ≈ evtx, kv_plain ≈ mft: two formats,
# distinct field sets, same downstream DAG).
KV_PROVIDER = LogPattern(
    "kv_provider",
    r'^(\S+) (\S+) provider="([^"]*)" doc=(\S+) src=(\S*) n=([0-9]+)$',
    ("ts", "level", "provider", "doc", "src", "n"),
)
KV_PLAIN = LogPattern(
    "kv_plain",
    r"^(\S+) (\S+) doc=(\S+) src=(\S*) n=([0-9]+)$",
    ("ts", "level", "doc", "src", "n"),
)
DEFAULT_PATTERNS: tuple[LogPattern, ...] = (KV_PROVIDER, KV_PLAIN)


def all_fields(patterns: Sequence[LogPattern]) -> list[str]:
    seen: dict[str, None] = {}
    for p in patterns:
        for f in p.fields:
            seen.setdefault(f)
    return list(seen)


GROUP_SEP = "\x01"  # separator for the one-pass group extraction


def parse_lines(
    df: DataFrame,
    line_col: str = "line",
    patterns: Sequence[LogPattern] = DEFAULT_PATTERNS,
    method: str = "replace",
) -> DataFrame:
    """Parse a string column into typed fields + parser tag + error flag.

    Adds per field ``f``: the raw extracted text ``f``, its sniffed map-type
    code ``f__t`` and runtime code ``f__r`` (see functions.sniff docstrings).
    Missing field / no match -> NULL (never "").

    ``method`` picks the group-extraction strategy (identical outputs,
    pinned by test_parse_methods_identical):

    * ``"replace"`` (default): ONE regex execution per row for the
      matching pattern — ``regexp_replace`` rewrites the line to its
      groups joined by ``GROUP_SEP`` (0x01), then a literal split +
      ``element_at`` per field.  k fields cost one match + one split
      instead of k full matches.  Guarded (ADVICE r3): ``\\S``-class and
      ``[^"]*`` groups CAN capture a literal 0x01, which would shift the
      split — so each row checks ``size(split) == len(fields)`` and
      falls back to per-field ``regexp_extract`` on mismatch (CASE
      branches evaluate lazily, so clean rows — the overwhelming
      majority — still pay one match + one split; a poisoned row pays
      the old k-match price but parses CORRECTLY instead of silently
      shifting every subsequent field).  Any 0x01 inside a group always
      inflates the split count (k groups joined by k-1 separators yield
      exactly k parts only when no group contains the separator), so the
      guard cannot miss.
    * ``"extract"``: classic ``regexp_extract`` per field (k full regex
      executions per row); no separator caveat, kept as the fallback and
      as the shape mirrored by the DuckDB twin ``parse_sql``.
    """
    line = F.col(line_col)
    parser = F.lit(None).cast("string")
    for p in reversed(patterns):  # first match wins
        parser = F.when(line.rlike(p.regex), F.lit(p.name)).otherwise(parser)

    # Staged selects (not a withColumn loop): each stage's expressions
    # reference the previous stage's *attributes*, keeping the plan linear
    # in fields instead of re-inlining the detection cascade per field.
    fields = all_fields(patterns)
    stage1 = df.select("*", parser.alias("parser"))
    if method == "replace":
        garr = []
        for p in patterns:
            repl = GROUP_SEP.join(f"${i + 1}" for i in range(len(p.fields)))
            garr.append(
                F.when(
                    F.col("parser") == p.name,
                    F.split(F.regexp_replace(line, p.regex, repl), GROUP_SEP),
                ).alias(f"__g_{p.name}")
            )
        stage1 = stage1.select("*", *garr)
        value_cols = []
        for f in fields:
            value = F.lit(None).cast("string")
            for p in reversed(patterns):
                if f in p.fields:
                    idx = p.fields.index(f) + 1
                    clean = F.size(F.col(f"__g_{p.name}")) == len(p.fields)
                    value = (
                        F.when(
                            (F.col("parser") == p.name) & clean,
                            F.element_at(F.col(f"__g_{p.name}"), idx),
                        )
                        .when(  # group contained GROUP_SEP: slow-but-correct
                            F.col("parser") == p.name,
                            F.regexp_extract(line, p.regex, idx),
                        )
                        .otherwise(value)
                    )
            value_cols.append(value.alias(f))
        stage2 = stage1.select(
            "*", F.col("parser").isNull().alias("parse_error"), *value_cols
        ).drop(*[f"__g_{p.name}" for p in patterns])
    elif method == "extract":
        value_cols = []
        for f in fields:
            value = F.lit(None).cast("string")
            for p in reversed(patterns):
                if f in p.fields:
                    idx = p.fields.index(f) + 1
                    value = F.when(
                        F.col("parser") == p.name,
                        F.regexp_extract(line, p.regex, idx),
                    ).otherwise(value)
            value_cols.append(value.alias(f))
        stage2 = stage1.select(
            "*", F.col("parser").isNull().alias("parse_error"), *value_cols
        )
    else:
        raise ValueError(f"method must be 'replace' or 'extract', got {method!r}")
    stage3 = stage2.select(
        "*", *[sniff.sniff_code(F.col(f)).alias(f"{f}__t") for f in fields]
    )
    return stage3.select(
        "*",
        *[
            sniff.materialized_runtime_code(F.col(f), F.col(f"{f}__t"))
            .alias(f"{f}__r")
            for f in fields
        ],
    )


def parse_lines_pandas(
    df: DataFrame,
    line_col: str = "line",
    patterns: Sequence[LogPattern] = DEFAULT_PATTERNS,
) -> DataFrame:
    """Arrow-batched UDF variant for very large pattern registries.

    One ``mapInPandas`` pass; each batch applies pre-compiled Python regexes
    via ``Series.str.extract`` (vectorized in pandas).  Output schema matches
    :func:`parse_lines` minus the sniff columns (add them after with
    ``withColumns`` — they're plain expressions).
    """
    import re

    fields = all_fields(patterns)
    compiled = [(p.name, re.compile(p.regex), p.fields) for p in patterns]
    out_schema = df.schema.simpleString()[7:-1] + \
        ", parser string, parse_error boolean, " + \
        ", ".join(f"{f} string" for f in fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = pdf[line_col]
            parser = pd.Series([None] * len(pdf), dtype=object)
            cols = {f: pd.Series([None] * len(pdf), dtype=object) for f in fields}
            todo = pd.Series(True, index=pdf.index)
            for name, rx, pfields in compiled:
                ext = lines[todo].str.extract(rx)
                hit = ext.notna().all(axis=1)
                hit_idx = ext.index[hit]
                parser.loc[hit_idx] = name
                for i, f in enumerate(pfields):
                    cols[f].loc[hit_idx] = ext.loc[hit_idx, i]
                todo.loc[hit_idx] = False
            res = pdf.copy()
            res["parser"] = parser
            res["parse_error"] = parser.isna()
            for f in fields:
                res[f] = cols[f]
            yield res

    return df.mapInPandas(run, out_schema)


def parse_ndjson(df: DataFrame, line_col: str = "line") -> DataFrame:
    """S3/S6 analog — dynamic two-pass NDJSON parse.

    Pass 1 infers the merged type tree over the whole column
    (lattice.json_tree_schema — the distributed Mapping::map_json fold);
    pass 2 parses every line against the inferred schema with the JVM
    ``from_json`` (the cast-to-merged-map semantics of the ingest phase,
    ``src/elastic.rs:76-99``).  Unparseable lines get a null ``rec`` and
    ``parse_error`` true (quarantine, not panic).
    """
    from pyspark.sql import types as T

    from ulp_spark.operators import lattice

    tree = lattice.json_tree_schema(df, line_col)
    spark_type = lattice.tree_to_spark_type(tree)
    # Standard Spark JSON quarantine: a corrupt-record column inside the
    # struct marks malformed lines (PERMISSIVE from_json otherwise yields an
    # all-null struct, indistinguishable from a legitimately-null record).
    assert isinstance(spark_type, T.StructType)
    with_corrupt = T.StructType(
        list(spark_type.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    rec = F.from_json(F.col(line_col), with_corrupt,
                      {"columnNameOfCorruptRecord": "_corrupt_record"})
    return (
        df.withColumn("rec", rec)
        .withColumn("parse_error",
                    F.col("rec").isNull() | F.col("rec._corrupt_record").isNotNull())
    )


def parse_sql(line_expr: str, patterns: Sequence[LogPattern] = DEFAULT_PATTERNS
              ) -> dict[str, str]:
    """DuckDB twins: SELECT-able SQL for parser tag and each field."""
    exprs: dict[str, str] = {}
    parser = "NULL"
    for p in reversed(patterns):
        parser = (f"CASE WHEN regexp_matches({line_expr}, '{p.regex}') "
                  f"THEN '{p.name}' ELSE {parser} END")
    exprs["parser"] = parser
    for f in all_fields(patterns):
        v = "NULL"
        for p in reversed(patterns):
            if f in p.fields:
                idx = p.fields.index(f) + 1
                v = (f"CASE WHEN ({parser}) = '{p.name}' THEN "
                     f"regexp_extract({line_expr}, '{p.regex}', {idx}) "
                     f"ELSE {v} END")
        exprs[f] = v
    return exprs

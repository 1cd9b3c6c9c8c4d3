"""The flagship parse -> enrich -> route -> cast -> aggregate DAG.

This is the reference's whole program as one declarative plan
(SURVEY.md §3.1-3.2): both of ulp's phases (parse/infer and
route/cast/ingest), minus the HTTP shell, with the resume seam kept as an
optional checkpoint of the parsed table (S5's NDJSON intermediate).

Scale shape (the part that must survive 100 TB):
* exactly one wide shuffle per phase — the groupBy aggregations; parsing,
  sniffing, routing, enrichment (broadcast) and casting are all narrow;
* the token-payload join is doc_id-to-doc_id between two tables that share
  the key distribution — at cluster scale both sides come from Iceberg
  bucketed by hash(doc_id) so it's co-located (storage-partitioned join,
  no shuffle); on local parquet it's one shuffle pair, which AQE sizes;
* `source` is skewed (60% one key): per-sink histograms aggregate by
  (source, bucket) — the bucket dimension already splits the hot key; for
  pure per-source totals use operators.agg.salted_agg.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ulp_spark import fixtures
from ulp_spark.functions import routes as routes_fn
from ulp_spark.functions import sanitize
from ulp_spark.operators import enrich, fanout, lattice, parse, route_cast

QUARANTINE = "quarantine"
ROUTE_TEMPLATES = {
    # J2: per-parser default route templates (reference src/lib.rs:48-56 —
    # evtx gets a field-extraction template, mft a literal).
    "kv_provider": "evtx_{{provider}}",
    "kv_plain": "evtx_{{provider}}",
}
HIST_BUCKET = 64  # tokens-per-source histogram bucket width


@dataclass
class Pipeline:
    sequences: DataFrame
    parsed: DataFrame          # + fields, parser, parse_error
    routed: DataFrame          # + route
    route_counts: DataFrame    # (route, n_rows)
    routed_tokens: DataFrame   # route + token payload, bitwise invariant
    source_token_hist: DataFrame  # (source, bucket, n_rows, sum_tok)


def route_expr(parsed: DataFrame):
    """Route column: per-parser template eval -> sanitize; parse errors are
    quarantined (deviation: the reference panics on unknown input,
    ``src/lib.rs:90`` — a 10^12-row job must not)."""
    fields = {}
    for f in parse.all_fields(parse.DEFAULT_PATTERNS):
        fields[f] = (F.col(f), F.col(f"{f}__t"))
    expr = F.lit(None).cast("string")
    for parser_name, template in ROUTE_TEMPLATES.items():
        compiled = routes_fn.compile_template(template, fields)
        expr = F.when(F.col("parser") == parser_name, compiled).otherwise(expr)
    return F.when(
        F.col("parse_error"), F.lit(QUARANTINE)
    ).otherwise(sanitize.sanitize_sink_name(expr))


def build(
    spark: SparkSession,
    n: int = 10_000,
    partitions: int | None = None,
    sequences_df: DataFrame | None = None,
    lines_df: DataFrame | None = None,
    checkpoint: str | None = None,
) -> Pipeline:
    """``checkpoint``: None | "local" | a directory path.

    The reference materializes parse output as NDJSON between its two phases
    (S5, ``src/evtx.rs:52-53`` -> ``src/elastic.rs:83``) — that seam is both
    its resume point and its plan boundary.  We keep it optional: "local"
    truncates lineage in memory (bench/interactive), a path writes the
    parsed+routed table as parquet and reads it back (resumable, exactly the
    reference's architecture); None composes one lazy plan (fine for small
    fixtures; at many-action or huge-plan scale the seam also bounds
    codegen/optimizer cost).
    """
    seq = sequences_df if sequences_df is not None else fixtures.sequences(
        spark, n, partitions)
    lines = lines_df if lines_df is not None else fixtures.raw_lines(
        spark, n, partitions)

    parsed = parse.parse_lines(lines)
    enriched = enrich.enrich(parsed, fixtures.pattern_dict(spark), on="provider")
    routed = enriched.withColumn("route", route_expr(enriched))
    if checkpoint:
        # Slim the materialized table: raw line kept only for quarantined
        # rows (its one consumer — forensics/re-parse), and the derived
        # __r runtime codes recomputed after the read (cheap expressions
        # over persisted value+__t columns).  Persisted width drives the
        # seam's write cost at every scale.
        fields = parse.all_fields(parse.DEFAULT_PATTERNS)
        routed = routed.withColumn(
            "line", F.when(F.col("parse_error"), F.col("line"))
        ).drop(*[f"{f}__r" for f in fields])
        if checkpoint == "local":
            routed = routed.localCheckpoint()
        else:
            routed.write.mode("overwrite").parquet(checkpoint)
            routed = spark.read.parquet(checkpoint)
        from ulp_spark.functions import sniff as sniff_fn

        routed = routed.select(
            "*",
            *[
                sniff_fn.materialized_runtime_code(F.col(f), F.col(f"{f}__t"))
                .alias(f"{f}__r")
                for f in fields
            ],
        )

    route_counts = fanout.route_counts(routed)

    # Token payload join (doc -> doc_id): bitwise-equality carrier.
    routed_tokens = (
        routed.filter(~F.col("parse_error"))
        .select("doc", "route", "parser", "category")
        .join(seq.select("doc_id", "tokens", "n_tok", "source"),
              F.col("doc") == F.col("doc_id"))
        .drop("doc")
    )

    source_token_hist = (
        routed_tokens.groupBy(
            "source",
            # clamp: the fixture guarantees n_tok >= 1, but an external
            # sequences_df with zero-token docs must land in bucket 0, not
            # a phantom bucket -1 (mirrored in pipeline.routed_sql's twin)
            F.greatest(
                F.floor((F.col("n_tok") - 1) / HIST_BUCKET), F.lit(0)
            ).cast("int").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("n_tok").alias("sum_tok"))
    )

    return Pipeline(
        sequences=seq,
        parsed=parsed,
        routed=routed,
        route_counts=route_counts,
        routed_tokens=routed_tokens,
        source_token_hist=source_token_hist,
    )


def infer_and_cast(p: Pipeline) -> tuple[dict[str, dict[str, int]], DataFrame]:
    """Phase 2: per-route schema inference (A2) + single-pass cast (P7).

    Returns (route_schemas, casted frame with cast_error column)."""
    fields = parse.all_fields(parse.DEFAULT_PATTERNS)
    ok = p.routed.filter(~F.col("parse_error"))
    schemas = lattice.route_schemas(ok, fields)
    casted = route_cast.cast_single_pass(ok, schemas, fields)
    return schemas, casted


# ---------------------------------------------------------------------------
# DuckDB oracle: the same route derivation as one SQL string
# ---------------------------------------------------------------------------

def routed_sql(n: int) -> str:
    """DuckDB SQL producing (doc_id, parser, route) for raw_lines(n)."""
    from ulp_spark.functions import sniff

    px = parse.parse_sql("line")
    provider_code = sniff.sniff_code_sql(px["provider"])
    part = routes_fn.field_part_sql(px["provider"], provider_code)
    sanitized = sanitize.sanitize_sink_name_sql(f"'evtx_' || ({part})")
    return f"""
    WITH lines AS ({fixtures.raw_lines_sql(n)})
    SELECT doc_id,
           {px['parser']} AS parser,
           CASE WHEN ({px['parser']}) IS NULL THEN '{QUARANTINE}'
                ELSE {sanitized} END AS route
    FROM lines
    """

"""Fixture generators: Spark and DuckDB sides must agree bitwise.

This parity is the foundation of every oracle_sql() check: if the two
generators ever drift, all downstream correctness comparisons are void.
"""

from __future__ import annotations

import duckdb
import numpy as np

from ulp_spark import fixtures

N = 500


def test_sequences_parity(spark):
    got = fixtures.sequences(spark, N).orderBy("seq_no").collect()
    exp = duckdb.sql(fixtures.sequences_sql(N) + " ORDER BY seq_no").fetchall()
    assert len(got) == N == len(exp)
    for g, e in zip(got, exp):
        assert g.doc_id == e[0]
        assert g.tokens == e[1], g.doc_id
        assert g.n_tok == e[2] == len(g.tokens)
        assert g.source == e[3]


def test_sequences_tokens_are_int32(spark):
    # Bitwise int32 equality is the per-row invariant (BASELINE.json input_hint):
    # the Arrow schema must carry list<int32>, never upcast.
    tbl = fixtures.sequences(spark, 10).toArrow()
    import pyarrow as pa

    assert tbl.schema.field("tokens").type == pa.list_(pa.int32())
    assert tbl.schema.field("n_tok").type == pa.int32()


def test_sequences_partition_invariance(spark):
    a = fixtures.sequences(spark, N, partitions=1).orderBy("seq_no").collect()
    b = fixtures.sequences(spark, N, partitions=7).orderBy("seq_no").collect()
    assert a == b


def test_raw_lines_parity(spark):
    got = fixtures.raw_lines(spark, N).orderBy("doc_id").collect()
    exp = duckdb.sql(fixtures.raw_lines_sql(N) + " ORDER BY doc_id").fetchall()
    assert [(r.doc_id, r.line) for r in got] == [(e[0], e[1]) for e in exp]


def test_raw_lines_bucket_mix(spark):
    rows = fixtures.raw_lines(spark, 100).collect()
    normal = [r for r in rows if 'provider="' in r.line and 'provider="17"' not in r.line]
    missing = [r for r in rows if "provider=" not in r.line and "corrupt" not in r.line]
    corrupt = [r for r in rows if "!!corrupt" in r.line]
    numeric = [r for r in rows if 'provider="17"' in r.line]
    assert (len(normal), len(missing), len(corrupt), len(numeric)) == (90, 5, 3, 2)


def test_source_skew(spark):
    counts = dict(
        (r.source, r.cnt)
        for r in fixtures.sequences(spark, 1000).groupBy("source").count()
        .withColumnRenamed("count", "cnt").collect()
    )
    assert counts["web"] == 600 and counts["books"] == 200
    assert counts["code"] == 100 and counts["wiki"] == 90
    assert counts[None] == 10


def test_pattern_dict_parity(spark):
    got = sorted(map(tuple, fixtures.pattern_dict(spark).collect()))
    exp = sorted(map(tuple, duckdb.sql(fixtures.pattern_dict_sql()).fetchall()))
    assert got == exp


def test_routed_tokens_bitwise_equal_to_oracle(spark):
    """SURVEY §5.2: routed rows' token arrays are BITWISE equal to the
    reference oracle — compared as raw int32 buffers, not just values."""
    from array import array

    from ulp_spark.plans import pipeline

    n = 2_000
    p = pipeline.build(spark, n=n)
    got = {r.doc_id: r.tokens for r in p.routed_tokens.collect()}

    # pure-Python oracle of the generator + routing (parse misses excluded)
    def oracle_tokens(i):
        n_tok = (i * 7919) % 512 + 1
        return array("i", [(i * 31 + j * 17) % 50257 for j in range(n_tok)])

    expected_ids = {f"doc-{i:08d}" for i in range(n) if i % 100 < 95 or i % 100 >= 98}
    assert set(got) == expected_ids
    for i in range(n):
        doc_id = f"doc-{i:08d}"
        if doc_id not in got:
            continue
        exp = oracle_tokens(i)
        assert array("i", got[doc_id]).tobytes() == exp.tobytes(), doc_id

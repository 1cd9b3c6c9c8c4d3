"""T7 — route-template compile/eval (reference ``src/type_map.rs:14-62``,
inline test ``src/type_map.rs:201-218``) and sink-name sanitization
(``src/elastic.rs:156-182``)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ulp_spark.functions import routes, sanitize, sniff


def test_split_template():
    assert routes.split_template("{{x.y}}_aaa_{{a.b}}_bbb") == [
        ("x.y", True), ("_aaa_", False), ("a.b", True), ("_bbb", False),
    ]
    assert routes.split_template("evtx_{{provider}}") == [
        ("evtx_", False), ("provider", True),
    ]
    assert routes.split_template("mft") == [("mft", False)]


def _eval_routes(spark, template, data, fields):
    """data: list of dicts name->(value, code); returns evaluated routes."""
    rows = [
        tuple(v for name in fields for v in (d.get(name, (None, sniff.NULL))))
        for d in data
    ]
    safe = {n: n.replace(".", "__") for n in fields}
    schema = ", ".join(f"{safe[n]}_v string, {safe[n]}_c int" for n in fields)
    df = spark.createDataFrame(rows, schema)
    col = routes.compile_template(
        template, {n: (F.col(f"{safe[n]}_v"), F.col(f"{safe[n]}_c")) for n in fields}
    )
    return [r[0] for r in df.select(col).collect()]


def test_route_reference_case(spark):
    # src/type_map.rs:201-218: "{{x.y}}_aaa_{{a.b}}_bbb" over nested values
    got = _eval_routes(
        spark,
        "{{x.y}}_aaa_{{a.b}}_bbb",
        [{"x.y": ("apple", sniff.STR), "a.b": ("pear", sniff.STR)}],
        ["x.y", "a.b"],
    )
    assert got == ["apple_aaa_pear_bbb"]


def test_route_quirks(spark):
    cases = [
        ({"provider": ("Microsoft", sniff.STR)}, "evtx_Microsoft"),
        ({}, "evtx_NONE"),                                  # missing -> NONE
        ({"provider": ("17", sniff.INT)}, "evtx_"),         # number -> silent
        ({"provider": ("2.5", sniff.FLOAT)}, "evtx_"),
        # non-finite Float sniffs are runtime STRINGS (JSON can't hold inf):
        # the reference's as_str() succeeds -> routes as the text
        ({"provider": ("inf", sniff.FLOAT)}, "evtx_inf"),
        ({"provider": ("1e999", sniff.FLOAT)}, "evtx_1e999"),
        ({"provider": ("true", sniff.BOOL)}, "evtx_"),
        ({"provider": ("0", sniff.NULL)}, "evtx_"),         # JSON null value
    ]
    got = _eval_routes(spark, "evtx_{{provider}}", [c for c, _ in cases], ["provider"])
    assert got == [e for _, e in cases]


def test_route_unknown_field_is_none(spark):
    got = _eval_routes(spark, "evtx_{{nope}}", [{}], ["provider"])
    assert got == ["evtx_NONE"]


SANITIZE_CASES = [
    ("evtx_App Log/Main", "evtx_app_logmain"),
    ("_WEIRD:NAME*", "weirdname"),
    ("evtx_NONE", "evtx_none"),
    ('A:B"C*D+E/F\\G|H?I#J%K>L<M', "abcdefghijklm"),
    # SEQUENTIAL leading trims ('_' then '.' then '-', the Rust order): a
    # mixed run is NOT fully stripped (round-1 regex ^[_.-]+ was wrong).
    ("...---___x", "___x"),
    ("-_foo", "_foo"),
    ("._foo", "_foo"),
    ("__..--x", "x"),
    # ASCII-only lowercase (make_ascii_lowercase): non-ASCII untouched
    ("ÉCLAIR cafe", "Éclair_cafe"),
    ("evtx_", "evtx_"),
]


def test_sanitize_spark(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(SANITIZE_CASES)],
                               "i int, s string")
    got = [r[0] for r in
           df.orderBy("i").select(sanitize.sanitize_sink_name(F.col("s"))).collect()]
    assert got == [e for _, e in SANITIZE_CASES]


def test_sanitize_duckdb_twin():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, s) for i, (s, _) in enumerate(SANITIZE_CASES)])
    got = [r[0] for r in con.sql(
        f"SELECT {sanitize.sanitize_sink_name_sql('s')} FROM t ORDER BY i"
    ).fetchall()]
    assert got == [e for _, e in SANITIZE_CASES]


def test_route_runtime_string_types(spark):
    # IPv4/IPv6/Date-sniffed values are runtime strings -> route as themselves
    # (found by driving: as_str() succeeds on them in the reference).
    cases = [
        ({"provider": ("10.0.0.1", sniff.IPV4)}, "evtx_10.0.0.1"),
        ({"provider": ("::1", sniff.IPV6)}, "evtx_::1"),
        ({"provider": ("2022-03-23T10:00:00Z", sniff.DATE)},
         "evtx_2022-03-23T10:00:00Z"),
    ]
    got = _eval_routes(spark, "evtx_{{provider}}", [c for c, _ in cases], ["provider"])
    assert got == [e for _, e in cases]


def test_parse_methods_identical(spark):
    """The one-regex-execution 'replace' path must produce byte-identical
    rows to the classic regexp_extract path, including empty groups
    (src=), no-match quarantine nulls, and sniff codes."""
    from ulp_spark import fixtures
    from ulp_spark.operators import parse as parse_op

    lines = fixtures.raw_lines(spark, 500)
    a = parse_op.parse_lines(lines, method="replace")
    b = parse_op.parse_lines(lines, method="extract")
    assert a.columns == b.columns
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_op.parse_lines(lines, method="nope")


def test_parse_replace_guard_group_containing_separator(spark):
    """ADVICE r3: \\S-class groups CAN capture a literal 0x01; the replace
    path must detect the shifted split and fall back to regexp_extract,
    never silently corrupting subsequent fields."""
    from ulp_spark.operators import parse as parse_op

    poisoned = f"2024-01-01T00:00:00Z INFO doc=a{parse_op.GROUP_SEP}b src=x n=5"
    clean = "2024-01-01T00:00:00Z WARN doc=plain src=y n=7"
    df = spark.createDataFrame([(poisoned,), (clean,)], "line string")
    a = parse_op.parse_lines(df, method="replace")
    b = parse_op.parse_lines(df, method="extract")
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    row = {r["line"]: r for r in a.collect()}[poisoned]
    assert row["parser"] == "kv_plain"
    assert row["doc"] == f"a{parse_op.GROUP_SEP}b"   # intact, not shifted
    assert row["src"] == "x" and row["n"] == "5"

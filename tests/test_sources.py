"""S1/S2 — glob scan + format detection + unified line reader, plus the
per-route typed cast (cast_per_route) and DDL generation (S8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ulp_spark import fixtures
from ulp_spark.functions import sniff
from ulp_spark.operators import lattice, parse, route_cast
from ulp_spark.plans import pipeline
from ulp_spark.sources import registry


def _mk(tmp_path, name, content: bytes):
    p = tmp_path / name
    p.write_bytes(content)
    return str(p)


def test_scan_plan_detection(tmp_path):
    _mk(tmp_path, "a.jsonl", b'{"x": 1}\n{"x": 2}\n')
    _mk(tmp_path, "b.log", b"2022-03-23T00:00:00Z INFO hello\n")
    _mk(tmp_path, "c.parquet", b"PAR1xxxxPAR1")
    _mk(tmp_path, "d.bin", b"\x00\x01\x02\x03")
    plan = registry.plan_scan(str(tmp_path / "*"))
    assert [p.split("/")[-1] for p in plan.groups["ndjson"]] == ["a.jsonl"]
    assert [p.split("/")[-1] for p in plan.groups["kv_log"]] == ["b.log"]
    assert [p.split("/")[-1] for p in plan.groups["parquet"]] == ["c.parquet"]
    assert [p.split("/")[-1] for p in plan.unknown] == ["d.bin"]


def test_scan_empty_glob_is_empty_not_panic(tmp_path):
    plan = registry.plan_scan(str(tmp_path / "nope-*"))
    assert plan.groups == {}


def test_read_lines_union(spark, tmp_path):
    _mk(tmp_path, "a.jsonl", b'{"x": 1}\n{"x": 2}\n')
    _mk(tmp_path, "b.log", b"l1\nl2\nl3\n")
    df = registry.read_lines(spark, registry.plan_scan(str(tmp_path / "*")))
    rows = df.collect()
    assert len(rows) == 5
    assert {r.format for r in rows} == {"ndjson", "kv_log"}
    assert all(r.path.endswith((".jsonl", ".log")) for r in rows)


def test_detect_line_format(spark):
    df = spark.createDataFrame(
        [(1, '{"a":1}'), (2, "2022-03-23T00:00:00Z INFO x"), (3, "garbage")],
        "i int, line string")
    got = {r.i: r.f for r in df.select(
        "i", registry.detect_line_format(F.col("line")).alias("f")).collect()}
    assert got == {1: "ndjson", 2: "kv_log", 3: "unknown"}


def test_cast_per_route_typed_schemas(spark):
    p = pipeline.build(spark, n=500)
    ok = p.routed.filter(~F.col("parse_error"))
    fields = parse.all_fields(parse.DEFAULT_PATTERNS)
    schemas = lattice.route_schemas(ok, fields)
    tables = route_cast.cast_per_route(ok, schemas, fields, keep=["doc_id", "route"])
    r = "evtx_microsoft-windows-security-auditing"
    t = tables[r]
    dt = dict(t.dtypes)
    assert dt["n"] == "bigint" and dt["ts"] == "string"
    rows = t.collect()
    assert all(not x.cast_error for x in rows)
    assert all(isinstance(x.n, int) for x in rows)
    assert all(x.ts.endswith("+00:00") for x in rows)  # RFC3339 UTC re-emit
    # evtx_: provider type Int per schema (numeric provider quirk rows)
    t2 = tables["evtx_"]
    assert dict(t2.dtypes)["provider"] == "bigint"
    assert all(x.provider == 17 for x in t2.collect())


def test_schema_ddl(spark):
    ddl = route_cast.spark_schema_ddl(
        {"ts": sniff.DATE, "n": sniff.INT, "provider": sniff.STR})
    assert ddl == "n BIGINT, provider STRING, ts STRING"
    # DDL round-trips through a real CREATE TABLE statement
    spark.sql("DROP TABLE IF EXISTS _ddl_check")
    spark.sql(f"CREATE TABLE _ddl_check ({ddl}) USING parquet "
              "LOCATION '/tmp/_ddl_check'")
    assert [f.name for f in spark.table("_ddl_check").schema.fields] == \
        ["n", "provider", "ts"]
    spark.sql("DROP TABLE _ddl_check")


def test_parse_lines_pandas_equivalence(spark):
    lines = fixtures.raw_lines(spark, 300)
    a = parse.parse_lines(lines).select(
        "doc_id", "parser", "parse_error", "ts", "level", "provider", "doc",
        "src", "n").orderBy("doc_id").collect()
    b = parse.parse_lines_pandas(lines).select(
        "doc_id", "parser", "parse_error", "ts", "level", "provider", "doc",
        "src", "n").orderBy("doc_id").collect()
    assert a == b


def test_cast_single_pass_missing_field_error_is_false_not_null(spark):
    """Three-valued-logic regression: a route whose schema omits a field
    must yield cast_error = false for its rows, never NULL (a NULL error
    flag escapes BOTH filter(err) and filter(~err))."""
    from ulp_spark.functions import sniff as sn
    from ulp_spark.operators import route_cast

    df = spark.createDataFrame(
        [("A", "abc"), ("B", "abc")], "route string, f string")
    df = df.select("*", F.lit(sn.STR).alias("f__r"))
    schemas = {"A": {"f": sn.INT}, "B": {}}  # B has no target for f
    out = route_cast.cast_single_pass(df, schemas, ["f"])
    rows = {r.route: r.cast_error for r in out.collect()}
    assert rows == {"A": True, "B": False}  # B: no cast -> no error
    assert out.filter(F.col("cast_error")).count() \
        + out.filter(~F.col("cast_error")).count() == 2


def test_ivf_trained_fewer_rows_than_k(spark):
    from ulp_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(i + 1), 0.5, -0.25]) for i in range(5)],
        "vec_id long, embedding array<float>")
    cents = similarity.ivf_centroids_trained(df, "embedding", "vec_id", k=8)
    assert 0 < len(cents) <= 8
    cells = [r.c for r in df.select(
        similarity.ivf_assign(F.col("embedding"), cents).alias("c")).collect()]
    assert all(0 <= c < len(cents) for c in cells)


def test_csv_and_gzip_detection_and_readers(spark, tmp_path):
    """Round-3 format breadth: csv/tsv classify as table sources; gzip
    members classify as their INNER format (compression is storage, not
    format) and read transparently through the text reader."""
    import gzip

    from ulp_spark.sources import registry

    (tmp_path / "a.csv").write_text("x,y\n1,foo\n2,bar\n")
    (tmp_path / "b.tsv").write_text("x\ty\n")
    with gzip.open(tmp_path / "c.ndjson.gz", "wt") as f:
        f.write('{"k": 1}\n{"k": 2}\n')
    with gzip.open(tmp_path / "d.log.gz", "wt") as f:
        f.write("2024-01-01T00:00:00 INFO doc=a src=b n=1\n")
    (tmp_path / "e.gz").write_bytes(gzip.compress(b"???"))  # no inner ext

    plan = registry.plan_scan(str(tmp_path / "*"))
    assert [p.split("/")[-1] for p in plan.groups.get("csv", [])] == \
        ["a.csv", "b.tsv"]
    assert [p.split("/")[-1] for p in plan.groups.get("ndjson", [])] == \
        ["c.ndjson.gz"]
    assert [p.split("/")[-1] for p in plan.groups.get("kv_log", [])] == \
        ["d.log.gz"]
    assert [p.split("/")[-1] for p in plan.unknown] == ["e.gz"]

    lines = registry.read_lines(spark, plan)
    got = sorted(r.line for r in lines.collect())
    assert got == sorted(['{"k": 1}', '{"k": 2}',
                          "2024-01-01T00:00:00 INFO doc=a src=b n=1"])

    tables = registry.read_tables(spark, plan)
    # comma and tab files get separate readers (never one merged schema)
    assert set(tables) == {"csv", "tsv"}
    csv = tables["csv"]
    assert set(csv.columns) == {"x", "y"}
    assert csv.count() == 2
    assert dict(csv.dtypes)["x"] == "int"
    assert set(tables["tsv"].columns) == {"x", "y"}
    assert tables["tsv"].count() == 0  # header-only file


def test_orc_detection_and_reader(spark, tmp_path):
    """Round-4 format breadth: ORC classifies by its 'ORC' magic (even
    with a lying extension) and reads back typed through read_tables."""
    from ulp_spark.sources import registry

    src = spark.createDataFrame([(1, "foo"), (2, "bar")], "x int, y string")
    orc_dir = tmp_path / "orcdata"
    src.coalesce(1).write.orc(str(orc_dir))
    part = next(p for p in orc_dir.iterdir() if p.name.endswith(".orc"))
    data = part.read_bytes()
    assert data.startswith(b"ORC")
    renamed = tmp_path / "mystery.bin"  # magic wins over extension
    renamed.write_bytes(data)

    plan = registry.plan_scan(str(tmp_path / "mystery.*"))
    assert [p.split("/")[-1] for p in plan.groups.get("orc", [])] == \
        ["mystery.bin"]
    tables = registry.read_tables(spark, plan)
    got = sorted((r.x, r.y) for r in tables["orc"].collect())
    assert got == [(1, "foo"), (2, "bar")]


def test_cast_per_route_reads_seam_not_derivation(spark):
    """Round-4 wedge regression pin: cast_per_route must put a seam
    between the parse derivation and its per-route filter loop — pushing
    filter(route == r) through the unmaterialized parse tree re-inlines
    the whole derivation per route and blows Janino's 64 KB method limit
    (one route's collect measured at 490 s; with the seam, seconds)."""
    p = pipeline.build(spark, n=200)
    ok = p.routed.filter(~F.col("parse_error"))
    fields = parse.all_fields(parse.DEFAULT_PATTERNS)
    schemas = lattice.route_schemas(ok, fields)

    tables = route_cast.cast_per_route(ok, schemas, fields, keep=["doc_id"])
    one = next(iter(tables.values()))
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan  # reads the seam
    # the fixture generator (spark.range) never re-inlines below the seam
    assert "Range (" not in plan

    lazy = route_cast.cast_per_route(
        ok, schemas, fields, keep=["doc_id"], materialize=False)
    # analyzed (pre-optimizer) plan: running the optimizer over the
    # unmaterialized per-route tree is itself the 100 s+ pathology this
    # test pins, so the opt-out branch must not pay it here
    lazy_plan = next(iter(lazy.values()))._jdf.queryExecution() \
        .analyzed().toString()
    assert "Range (" in lazy_plan  # opt-out keeps the lazy derivation

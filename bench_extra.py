"""Per-operator isolation bench (guide §1.4) — bench.py stays FROZEN for
the driver; this file exists so single sections can be timed (and their
plans captured) without paying the whole bench wall.

Usage:  python bench_extra.py [section ...]
        sections: parse cast curation tokenize batches ann_small ann_tuned
                  lsh winnow tokcand tokgroups span js dsir scale10x
        (default: all)

Env:    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
        SPARK_GRAFT_CPUS    local[N] parallelism (default all cores)
        ULP_EXPLAIN_DIR     if set, write <section>.txt explain("formatted")
                            for the section's main frame

Each section mirrors bench.py's exact construction and action so numbers
are comparable 1:1; prints one JSON line per section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ulp_spark.operators import lattice, parse, route_cast  # noqa: E402
from ulp_spark.plans import pipeline  # noqa: E402
from ulp_spark.session import get_spark, seam  # noqa: E402

SF_SEQS = {"sf0.001": 10_000, "sf0.01": 100_000, "sf0.1": 1_000_000}


def _explain(df, name):
    d = os.environ.get("ULP_EXPLAIN_DIR")
    if d:
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{name}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    n_seqs = int(os.environ.get("ULP_BENCH_SEQS", SF_SEQS.get(sf_name, 1_000_000)))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count())
    want = set(sys.argv[1:]) or None

    def on(name):
        return want is None or name in want

    spark = get_spark("ulp_spark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    out: dict[str, dict] = {}

    def timed(section, sub, fn):
        sc.setJobDescription(f"{section}: {sub}")
        t0 = time.perf_counter()
        r = fn()
        dt = round(time.perf_counter() - t0, 3)
        out.setdefault(section, {})[sub] = dt
        sc.setJobDescription(None)
        return r

    # warmup (same as bench.py)
    pipeline.build(spark, n=1_000).route_counts.collect()

    sf = float(sf_name.replace("sf", "") or 0.1) if sf_name.startswith("sf") else 0.1
    rep = max(1, int(os.environ.get("ULP_BENCH_DOC_REP",
                                    100 if sf >= 0.1 else 10)))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = (
        docs.repartition(cpus * 4)
        .select(
            "doc_id", "text", "lang",
            F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("r"))
        .select(
            (F.col("doc_id") * rep + F.col("r")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" r"),
                     F.col("r").cast("string")).alias("text"),
            "lang")
    )

    if on("parse"):
        # sub-stage isolation: fixture alone, fixture+parse, full build
        from ulp_spark import fixtures
        timed("parse", "fixture_noop", lambda: fixtures.raw_lines(spark, n_seqs)
              .write.format("noop").mode("overwrite").save())
        pp = parse.parse_lines(fixtures.raw_lines(spark, n_seqs))
        timed("parse", "parse_noop", lambda: pp
              .write.format("noop").mode("overwrite").save())
        timed("parse", "parse_phase", lambda: pipeline.build(
            spark, n=n_seqs, checkpoint="local"))
        p = pipeline.build(spark, n=n_seqs, checkpoint="local")
        _explain(p.routed, "parse_routed")
        timed("parse", "parse_route_counts", lambda: p.route_counts.collect())
        timed("parse", "schema_infer", lambda: lattice.route_schemas(
            p.routed.filter(~F.col("parse_error")),
            parse.all_fields(parse.DEFAULT_PATTERNS)))
        timed("parse", "token_join_hist", lambda: p.source_token_hist.collect())

    if on("cast"):
        p = pipeline.build(spark, n=n_seqs, checkpoint="local")
        schemas = lattice.route_schemas(
            p.routed.filter(~F.col("parse_error")),
            parse.all_fields(parse.DEFAULT_PATTERNS))
        casted = route_cast.cast_single_pass(
            p.routed.filter(~F.col("parse_error")), schemas,
            parse.all_fields(parse.DEFAULT_PATTERNS))
        _explain(casted, "cast_single_pass")
        timed("cast", "cast_single_pass", lambda: casted
              .filter(~F.col("cast_error")).count())

    if on("curation"):
        from ulp_spark.operators import curation
        timed("curation", "repetition_signals", lambda: curation.repetition_stats(
            big, "text", "doc_id"
        ).agg(F.sum("n_words"), F.avg("dup_2gram_frac")).collect())
        pd_join = curation.passage_dup_stats(big, "text", "doc_id")
        _explain(pd_join, "passage_dedup_join")
        timed("curation", "passage_dedup", lambda: pd_join
              .agg(F.sum("n_passages"), F.sum("n_dup_passages")).collect())
        timed("curation", "passage_dedup_window", lambda: curation.passage_dup_stats(
            big, "text", "doc_id", via="window"
        ).agg(F.sum("n_passages"), F.sum("n_dup_passages")).collect())
        red, _c = curation.redact(F.col("text"))
        timed("curation", "pii_redact", lambda: big.select(
            F.sum(F.length(red))).collect())

    if on("tokenize") or on("batches"):
        from ulp_spark.operators import tokenizer
        import __spark_entry__ as _entry
        tok_in = big.filter(F.col("doc_id") % 5 == 0)
        t0t = time.perf_counter()
        tok_out = seam(tokenizer.tokenize(tok_in, "text", "doc_id",
                                          _entry._TOKENIZE_VOCAB))
        n_toks_out = tok_out.agg(F.sum("n_tok")).collect()[0][0]
        out.setdefault("tokenize", {})["sec"] = round(
            time.perf_counter() - t0t, 3)
        out["tokenize"]["tokens_out"] = int(n_toks_out)
        if on("batches"):
            from ulp_spark.operators import packing as _packing
            from ulp_spark.operators import sharding as _sharding
            from ulp_spark.operators import tokens as _tokens
            t0f = time.perf_counter()
            census = (
                tok_out.groupBy(_tokens.token_fingerprint(F.col("tokens"))
                                .alias("fp"))
                .agg(F.min("doc_id").alias("doc_id"),
                     F.min("n_tok").alias("n_tok")))
            packed = seam(_packing.pack_bins(
                census.select("doc_id", "n_tok"), capacity=2048, buckets=256))
            rows_df = _packing.pack_sequences(tok_out, packed)
            rows_df.agg(F.count(F.lit(1)), F.sum("n_tok")).collect()
            manifest = _sharding.shard_manifest(
                packed.select("doc_id", "n_tok"), shard_tokens=1 << 22)
            manifest.count()
            out.setdefault("batches", {})["downstream_sec"] = round(
                time.perf_counter() - t0f, 3)

    if on("ann_small"):
        from ulp_spark.operators import similarity
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_emb = emb.count()
        t0a = time.perf_counter()
        cents = similarity.ivf_centroids_trained(emb, "embedding", "vec_id",
                                                 k=8, rounds=1)
        qids = [int(x) for x in range(0, n_emb, max(1, n_emb // 10))][:10]
        rec = similarity.ann_recall(
            emb, "embedding", "vec_id", qids, cents, dim=64, k=10,
            n_probes=(1, 2, 4))
        _explain(rec, "ann_recall")
        rec.collect()
        out.setdefault("ann_small", {})["sec"] = round(
            time.perf_counter() - t0a, 3)

    if on("ann_tuned"):
        from ulp_spark import fixtures
        from ulp_spark.operators import similarity
        n_clu = 50_000
        clu = fixtures.clustered_embeddings(spark, n_clu, dim=64, clusters=20) \
            .localCheckpoint()
        t0t = time.perf_counter()
        scents = similarity.ivf_train_spherical(
            clu, "embedding", "vec_id", k=32, rounds=10, sample=8_000)
        out.setdefault("ann_tuned", {})["train_sec"] = round(
            time.perf_counter() - t0t, 3)
        tuned = similarity.tune_n_probe(
            clu, "embedding", "vec_id",
            list(range(0, n_clu, n_clu // 10))[:10],
            scents, dim=64, target_recall=0.85, max_probe=4)
        out["ann_tuned"]["sec"] = round(time.perf_counter() - t0t, 3)
        out["ann_tuned"].update(tuned)

    if on("lsh") or on("winnow"):
        from ulp_spark.operators import dedup
        lsh_docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .repartition(cpus * 2)
        lsh_docs.count()
        if on("lsh"):
            cand = dedup.minhash_candidates(lsh_docs, "text", "doc_id")
            _explain(cand, "minhash_candidates")
            t0l = time.perf_counter()
            n_pairs = cand.count()
            out.setdefault("lsh", {})["sec"] = round(
                time.perf_counter() - t0l, 3)
            out["lsh"]["pairs"] = int(n_pairs)
        if on("winnow"):
            wc = dedup.winnow_candidates(lsh_docs, "text", "doc_id")
            _explain(wc, "winnow_candidates")
            t0w = time.perf_counter()
            n_wpairs = wc.count()
            out.setdefault("winnow", {})["sec"] = round(
                time.perf_counter() - t0w, 3)
            out["winnow"]["pairs"] = int(n_wpairs)

    if on("tokcand") or on("tokgroups"):
        from ulp_spark import fixtures
        from ulp_spark.operators import tokens as toklib
        nd_n = min(n_seqs, 20_000)
        nd_base = fixtures.sequences(spark, nd_n)
        nd_aug = nd_base.select("doc_id", "tokens").unionAll(
            nd_base.filter((F.col("seq_no") % 20 == 0) & (F.col("n_tok") >= 8))
            .select(F.concat(F.col("doc_id"), F.lit("-near")).alias("doc_id"),
                    F.concat(F.slice(F.col("tokens"), 1, F.size("tokens") - 1),
                             F.array((F.element_at(F.col("tokens"), -1) + 1)
                                     .cast("int"))).alias("tokens")))
        if on("tokcand"):
            cand = toklib.sequence_minhash_candidates(
                nd_aug, "tokens", "doc_id")
            _explain(cand, "sequence_minhash_candidates")
            t0n = time.perf_counter()
            n_tok_pairs = cand.count()
            out.setdefault("tokcand", {})["sec"] = round(
                time.perf_counter() - t0n, 3)
            out["tokcand"]["pairs"] = int(n_tok_pairs)
        if on("tokgroups"):
            t0g = time.perf_counter()
            n_tok_groups = toklib.sequence_dedup_groups(
                nd_aug, "tokens", "doc_id").count()
            out.setdefault("tokgroups", {})["sec"] = round(
                time.perf_counter() - t0g, 3)
            out["tokgroups"]["rows"] = int(n_tok_groups)

    if on("span") or on("js"):
        from ulp_spark import fixtures
        from ulp_spark.operators import tokens as toklib
        sc_n = min(n_seqs, 200_000)
        sc_in = fixtures.sequences(spark, sc_n)
        if on("span"):
            sp = toklib.span_corruption(sc_in, "tokens", "doc_id")
            _explain(sp, "span_corruption")
            t0sc = time.perf_counter()
            sp.agg(F.sum(F.size("inputs")), F.sum(F.size("targets"))).collect()
            out.setdefault("span", {})["sec"] = round(
                time.perf_counter() - t0sc, 3)
        if on("js"):
            t0js = time.perf_counter()
            toklib.source_js_divergence(sc_in).count()
            out.setdefault("js", {})["sec"] = round(
                time.perf_counter() - t0js, 3)

    if on("dsir"):
        from ulp_spark.operators import classifier as _clf
        n_docs = docs.count() * rep
        dsir_in = big.filter(F.col("doc_id") % 5 == 0) if rep > 20 else big
        t0d = time.perf_counter()
        _clf.dsir_importance(
            dsir_in, "text", "doc_id",
            dsir_in.filter(F.col("lang") == "en")).count()
        out.setdefault("dsir", {})["sec"] = round(
            time.perf_counter() - t0d, 3)

    if on("scale10x"):
        t0s = time.perf_counter()
        p10 = pipeline.build(spark, n=n_seqs * 10, checkpoint="local")
        p10.route_counts.collect()
        s10 = lattice.route_schemas(
            p10.routed.filter(~F.col("parse_error")),
            parse.all_fields(parse.DEFAULT_PATTERNS))
        route_cast.cast_single_pass(
            p10.routed.filter(~F.col("parse_error")), s10,
            parse.all_fields(parse.DEFAULT_PATTERNS),
        ).filter(~F.col("cast_error")).count()
        out.setdefault("scale10x", {})["sec"] = round(
            time.perf_counter() - t0s, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

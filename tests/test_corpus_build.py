"""build_training_corpus: orchestration invariants (each stage's own
semantics is oracle-tested with its module; here we check the composition
wires them correctly and stays deterministic)."""

from pyspark.sql import functions as F

from mysql_syncer_spark.plans.corpus_build import build_training_corpus

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_build_default_rates_keep_everything_once(spark):
    docs = _docs(spark)
    out = build_training_corpus(docs, near_dup_jaccard=0.8).collect()
    assert len(out) > 0
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))  # one row per kept doc
    for r in out:
        assert r["n_copies"] == 1  # no rates → default rate 1.0
        assert r["split"] in ("train", "holdout")
        assert r["bucket"] in ("head", "middle", "tail")
        assert r["shard_idx"] == r["start_tok"] // 2048
    # kept ⊂ input and dedup actually dropped something
    assert 0 < len(ids) < docs.count()
    # all three quality buckets are populated at this threshold
    assert {r["bucket"] for r in out} == {"head", "middle", "tail"}
    # the synthetic corpus is aggressively near-duplicate: the default
    # 0.5 threshold keeps almost nothing (data property, not a bug)
    assert len(build_training_corpus(docs).select("doc_id").collect()) < len(ids)


def test_build_bucket_multipliers_and_rates(spark):
    docs = _docs(spark)
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    rates = {s: 2.0 for s in srcs}
    out = build_training_corpus(
        docs,
        rates=rates,
        bucket_rate_mult={"head": 1.5, "middle": 1.0, "tail": 0.0},
        near_dup_jaccard=0.8,
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["bucket"] != "tail"  # rate 0 drops the bucket
        if r["bucket"] == "middle":
            assert r["n_copies"] == 2  # 2.0 × 1.0
        else:
            assert r["n_copies"] == 3  # 2.0 × 1.5 = 3.0, zero fraction


def test_build_deterministic(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, build_training_corpus(docs, near_dup_jaccard=0.8).collect()))
    b = sorted(map(tuple, build_training_corpus(docs, near_dup_jaccard=0.8).collect()))
    assert a == b


def test_build_with_span_stripping(spark):
    # distinct documents (low token Jaccard -> near-dedup keeps them all)
    # that share one long boilerplate run -> span stripping must cut it
    import random

    rng = random.Random(7)
    words = ["alpha","bravo","charlie","delta","echo","foxtrot","golf",
             "hotel","india","juliet","kilo","lima","mike","november",
             "oscar","papa","quebec","romeo","sierra","tango","the","a",
             "is","and","of"]
    boiler = "subscribe to our newsletter for all the latest updates and offers"
    rows = []
    for i in range(12):
        body = " ".join(rng.choice(words) for _ in range(40))
        rows.append((i, body + " " + boiler, "en", f"d{i % 3}", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    base = build_training_corpus(docs, near_dup_jaccard=0.8)
    stripped = build_training_corpus(
        docs, near_dup_jaccard=0.8, strip_span_width=40
    )
    b = {r["doc_id"]: r for r in base.collect()}
    s = {r["doc_id"]: r for r in stripped.collect()}
    assert set(s) == set(b)  # stripping changes text, never membership
    # shared boilerplate runs were cut somewhere → total packed tokens drop,
    # and no doc ever gains tokens
    tb = sum(r["n_tokens"] for r in b.values())
    ts = sum(r["n_tokens"] for r in s.values())
    assert ts < tb
    assert all(s[i]["n_tokens"] <= b[i]["n_tokens"] for i in s)
    # deterministic
    again = {r["doc_id"]: r for r in build_training_corpus(
        docs, near_dup_jaccard=0.8, strip_span_width=40
    ).collect()}
    assert again == s


def test_build_with_decontamination(spark):
    docs = _docs(spark)
    # benchmark = verbatim sections of a few corpus docs
    bench = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.expr("substring(text, 10, 200)").alias("text")
    )
    base = {r["doc_id"] for r in build_training_corpus(
        docs, near_dup_jaccard=0.8
    ).collect()}
    clean = {r["doc_id"] for r in build_training_corpus(
        docs, near_dup_jaccard=0.8, benchmark=bench
    ).collect()}
    assert clean < base  # something contaminated was dropped
    # every dropped doc really shares a 13-gram with the benchmark
    from mysql_syncer_spark.functions.dedup_text import contaminated_docs

    flagged = {r["doc_id"] for r in contaminated_docs(docs, bench, n=13).collect()}
    assert base - clean <= flagged


def test_corpus_report_census(spark):
    import duckdb

    from mysql_syncer_spark.plans.corpus_build import corpus_report

    docs = _docs(spark)
    rep = {r["metric"]: r["value"] for r in corpus_report(
        docs, near_dup_jaccard=0.8, span_width=40
    ).collect()}
    # DuckDB twin for the base census
    want = duckdb.connect().execute(f"""
        WITH t AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS txt,
                 md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
          FROM read_parquet('{SF}/documents.parquet')
        )
        SELECT count(*), sum(length(txt)), count(DISTINCT fp) FROM t
    """).fetchone()
    assert rep["n_docs"] == float(want[0])
    assert rep["total_chars"] == float(want[1])
    assert rep["exact_dup_docs"] == float(want[0] - want[2])
    assert 0 <= rep["exact_dup_frac"] <= 1
    assert rep["avg_tokens"] > 0 and rep["total_tokens"] > 0
    # lang mix sums to n_docs
    assert sum(v for k, v in rep.items() if k.startswith("lang_")) == rep["n_docs"]
    # optional passes present and sane
    assert 0 <= rep["near_dup_frac"] <= 1 and rep["near_dup_docs"] > 0
    assert 0 <= rep["span_dup_char_frac"] <= 1

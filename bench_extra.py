"""Per-query isolation harness for the optimization rounds (guide §1).

NOT part of the driver contract — ``bench.py`` stays frozen. This tool:
- times each headline query (same list as bench.py) with the noop sink,
  median of N reps, in ONE session built exactly like bench.py's;
- captures ``.explain("formatted")`` per query so plan claims in
  OPTIMIZATION_r*.md are checkable;
- labels jobs via setJobDescription.

Usage:
  python bench_extra.py [query ...]          # default: all headline queries
  SPARK_GRAFT_BENCH_QUERY_REPS=3 python bench_extra.py doc_simhash
  SPARK_GRAFT_PLAN_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=_before \
      python bench_extra.py                  # also dump plan files

Prints one JSON line {"queries": {...}, "samples": {...}} and exits.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def _headline_queries(spark, sf_dir):
    """Same query set as bench.py part 1 (incl. the three bench-only ones)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    qs = dict(entrymod.queries())

    def _q_unigram_nll(spark, sf):
        from mysql_syncer_spark.functions.text import unigram_nll

        return unigram_nll(spark.read.parquet(f"{sf}/documents.parquet"))

    def _q_corpus_pack(spark, sf):
        from mysql_syncer_spark.functions.mixture import pack_sequences

        return pack_sequences(
            spark.read.parquet(f"{sf}/documents.parquet"), budget=2048
        )

    def _q_corpus_ingest(spark, sf):
        import tempfile

        from mysql_syncer_spark.sink.corpus_table import CorpusTable

        docs = spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", "text"
        )
        path = tempfile.mkdtemp(prefix="bench_corpus_") + "/corpus"
        t = CorpusTable.create(spark, path, k=8, bands=4, verify_jaccard=0.8)
        for i in range(3):
            t.apply_batch(f"b{i}", docs.filter(F.pmod("doc_id", F.lit(3)) == i))
        return t.read().groupBy().agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )

    qs["doc_unigram_nll"] = _q_unigram_nll
    qs["doc_pack_sequences"] = _q_corpus_pack
    qs["doc_corpus_ingest"] = _q_corpus_ingest
    return qs


HEADLINE = [
    "cdc_lww_final_state",
    "cdc_salted_lww_final_state",
    "cdc_merge_final_state",
    "cdc_op_routing_counts",
    "cdc_checkpoint_ledger",
    "doc_exact_dedup",
    "doc_minhash_lsh_pairs",
    "doc_quality",
    "doc_lang_id",
    "doc_simhash",
    "emb_cosine_topk",
    "emb_lsh_block_cosine_pairs",
    "doc_unigram_nll",
    "doc_pack_sequences",
    "doc_dup_span_stats",
    "doc_bm25_topk",
    "doc_corpus_ingest",
]


def _explain_str(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_REPS", "3"))
    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "")
    plan_suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "")
    names = sys.argv[1:] or HEADLINE

    from mysql_syncer_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cores=cpus, shuffle_partitions=2 * cpus)
    spark.range(2_000_000).selectExpr("sum(id)").collect()  # warmup
    qs = _headline_queries(spark, sf_dir)

    secs: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        ss: list[float] = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ss.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        samples[name] = ss
        s = sorted(ss)
        secs[name] = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        if plan_dir:
            os.makedirs(os.path.join(REPO, plan_dir), exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(
                os.path.join(REPO, plan_dir, f"{name}{plan_suffix}.txt"), "w"
            ) as f:
                f.write(_explain_str(spark, df))
    spark.stop()
    print(json.dumps({"queries": secs, "samples": samples}))


if __name__ == "__main__":
    main()

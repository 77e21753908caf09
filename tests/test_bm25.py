"""BM25 ranked retrieval over the tf-postings index: DuckDB oracle
parity on the real sf documents table + semantic ranking checks."""

import duckdb
import pyspark.sql.functions as F

from mysql_syncer_spark.functions.text import bm25_topk, doc_lengths, tf_postings

TERMS = ["data", "spark", "stream"]


def _oracle_bm25_sql(sf_dir: str, terms: list[str], k: int, k1: float, b: float) -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM read_parquet('{sf_dir}/documents.parquet')
),
tf AS (
  SELECT token, doc_id, count(*) AS tf FROM toks
  WHERE token <> '' GROUP BY token, doc_id
),
lens AS (
  SELECT doc_id, count(*) AS dl FROM toks WHERE token <> '' GROUP BY doc_id
),
lens_all AS (  -- docs that tokenize to nothing still count toward N
  SELECT d.doc_id, coalesce(l.dl, 0) AS dl
  FROM read_parquet('{sf_dir}/documents.parquet') d LEFT JOIN lens l USING (doc_id)
),
stats AS (SELECT count(*) AS n_corpus, avg(dl) AS avgdl FROM lens_all),
fetched AS (SELECT * FROM tf WHERE token IN ({tlist})),
dfreq AS (SELECT token, count(*) AS df FROM fetched GROUP BY token),
scored AS (
  SELECT f.doc_id,
    ln(1 + (s.n_corpus - d.df + 0.5) / (d.df + 0.5))
      * (f.tf * ({k1} + 1))
      / (f.tf + {k1} * (1 - {b} + {b} * l.dl / s.avgdl)) AS w
  FROM fetched f
  JOIN dfreq d USING (token)
  JOIN lens_all l USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, round(sum(w), 9) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def test_bm25_duckdb_oracle_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    got = [
        (r["doc_id"], round(float(r["score"]), 6))
        for r in bm25_topk(
            tf_postings(docs), doc_lengths(docs), TERMS, k=20
        ).collect()
    ]
    want = [
        (row[0], round(float(row[1]), 6))
        for row in duckdb.connect()
        .execute(_oracle_bm25_sql(sf_dir, TERMS, 20, 1.2, 0.75))
        .fetchall()
    ]
    assert len(got) == 20
    assert got == want


def test_bm25_ranking_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark spark spark engine"),          # high tf, short
            (1, "spark appears once in a much longer document about many "
                "other things entirely unrelated to the query terms here"),
            (2, "nothing relevant at all"),
            (3, "rare spark"),
        ],
        "doc_id long, text string",
    )
    res = bm25_topk(tf_postings(docs), doc_lengths(docs), ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in res]
    assert 2 not in ids                    # no hit, no row
    assert ids[0] in (0, 3)                # tf-boosted or length-normalized top
    assert set(ids) == {0, 1, 3}
    scores = {r["doc_id"]: r["score"] for r in res}
    assert scores[0] > scores[1]           # tf saturation still beats dilution


def test_bm25_df_cap_drops_stopwords(spark):
    docs = spark.createDataFrame(
        [(i, "common filler words " + ("alpha" if i == 0 else "beta")) for i in range(10)],
        "doc_id long, text string",
    )
    post = tf_postings(docs, max_df_frac=0.5)
    toks = {r["token"] for r in post.select("token").distinct().collect()}
    assert "common" not in toks and "alpha" in toks

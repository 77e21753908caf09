"""Incremental dedup: a new batch checked against a persisted band index.

Truth sources: (1) hand-built fixtures, (2) an equivalence property — the
incremental path must find exactly the pairs the full-corpus LSH self-join
finds, restricted to pairs touching the new batch (signatures depend only
on each doc's own text, so splitting the corpus cannot change any band
key), (3) DuckDB SQL parity of the index-side join on the real table.
"""

import duckdb

from pyspark.sql import functions as F

from mysql_syncer_spark.functions.dedup_text import (
    incremental_near_duplicates,
    lsh_candidate_pairs,
    minhash_bands,
    minhash_signatures,
)

SF = "/root/testdata/sf0.01"


def test_incremental_hand_truth(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "completely different words here")],
        "doc_id long, text string",
    )
    index = minhash_bands(minhash_signatures(corpus))
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),  # exact dup of indexed 1
            (11, "nothing shared with anyone zzz qqq"),
            (12, "nothing shared with anyone zzz qqq"),  # batch dup of 11
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["dup_of"], r["src"])
        for r in incremental_near_duplicates(new, index).collect()
    }
    assert (10, 1, "index") in got
    assert (12, 11, "batch") in got
    # the unique doc matches nothing, and nothing matches indexed 2
    assert not any(d == 11 and s == "index" for d, _, s in got)
    assert not any(o == 2 for _, o, _ in got)


def test_incremental_equals_full_corpus_restriction(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    index = minhash_bands(minhash_signatures(old))
    got = {
        (r["doc_id"], r["dup_of"], r["src"])
        for r in incremental_near_duplicates(new, index).collect()
    }

    full = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    want = set()
    for a, b in full:  # a < b by construction
        a_new, b_new = a % 5 == 0, b % 5 == 0
        if a_new and b_new:
            want.add((b, a, "batch"))
        elif a_new:
            want.add((a, b, "index"))
        elif b_new:
            want.add((b, a, "index"))
    assert got == want
    assert len(got) > 100  # the sf0.01 corpus has real near-dups in both legs


def test_incremental_index_join_matches_duckdb(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    index = minhash_bands(minhash_signatures(old))
    got = {
        (r["doc_id"], r["dup_of"])
        for r in incremental_near_duplicates(new, index)
        .filter(F.col("src") == "index")
        .collect()
    }

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{SF}/documents.parquet'"
    )
    mh = ", ".join(f"min(md5('mh{i}|' || token)) AS mh{i}" for i in range(8))
    oracle = con.execute(f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct(string_split_regex(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       ' '))) AS token
            FROM documents),
        sig AS (SELECT doc_id, {mh} FROM (SELECT * FROM tok WHERE token <> '')
                GROUP BY doc_id),
        banded AS (
            SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS key FROM sig
            UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM sig
            UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM sig
            UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM sig)
        SELECT DISTINCT n.doc_id, ix.doc_id AS dup_of
        FROM banded n JOIN banded ix
          ON n.band = ix.band AND n.key = ix.key
        WHERE n.doc_id % 5 = 0 AND ix.doc_id % 5 <> 0
    """).fetchall()
    assert got == set(oracle)

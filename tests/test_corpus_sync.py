"""CDC → training-corpus bridge (plans/corpus_sync.py): incremental
pages-changelog sync into the deduplicated corpus — initial load, dedup
gating, update re-gating, delete forgetting, idempotent re-sync."""

import os
import tempfile
import datetime as dt

import pyspark.sql.functions as F

from mysql_syncer_spark.plans.corpus_sync import (
    last_synced_version,
    sync_corpus,
)
from mysql_syncer_spark.sink.corpus_table import CorpusTable
from mysql_syncer_spark.sink.pages_table import PagesTable

SCHEMA = (
    "log_pos long, file_seq int, server_id int, op string, table string,"
    " tx_id long,"
    " before struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
    " after struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>,"
    " ddl struct<kind:string,col:string,new_name:string,dtype:string>"
)

T1 = "alpha beta gamma delta epsilon zeta"
T2 = "one two three four five six seven"
T2_NEW = "completely different recrawled content with fresh words"
T4 = "red orange yellow green blue indigo violet"


def _ev(spark, rows):
    """rows: (log_pos, file_seq, op, url, iso_ts, text)"""
    data = [
        (
            pos, seq, 1, op, "web.pages", 1, None,
            (url, dt.datetime.fromisoformat(ts), None, text, "en"),
            None,
        )
        for pos, seq, op, url, ts, text in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


def _texts(corpus):
    return {r["text"] for r in corpus.read().collect()}


def test_sync_corpus_end_to_end(spark):
    ppath = os.path.join(tempfile.mkdtemp(prefix="csync_p_"), "pages")
    cpath = os.path.join(tempfile.mkdtemp(prefix="csync_c_"), "corpus")
    pages = PagesTable.create(spark, ppath, num_buckets=4)
    corpus = CorpusTable.create(spark, cpath)

    # initial crawl: u3's text is an exact dup of u1's → the gate rejects
    pages.apply_batch(
        "b0",
        _ev(spark, [
            (1, 0, "I", "u1", "2024-01-01T00:00", T1),
            (2, 0, "I", "u2", "2024-01-01T00:01", T2),
            (3, 0, "I", "u3", "2024-01-01T00:02", T1),
            (4, 0, "I", "u4", "2024-01-01T00:03", T4),
        ]),
    )
    r1 = sync_corpus(spark, pages, corpus)
    assert not r1["skipped"] and r1["from_version"] is None
    assert r1["ingest"]["accepted"] == 3 and r1["ingest"]["rejected"] == 1
    assert _texts(corpus) == {T1, T2, T4}
    assert last_synced_version(corpus) == pages.manifest().version

    # nothing changed → no-op
    assert sync_corpus(spark, pages, corpus)["skipped"]

    # re-crawl u2 with fresh content; u4 deleted
    pages.apply_batch(
        "b1",
        _ev(spark, [
            (5, 1, "U", "u2", "2024-02-01T00:00", T2_NEW),
            (6, 1, "D", "u4", "2024-02-01T00:01", None),
        ]),
    )
    r2 = sync_corpus(spark, pages, corpus)
    assert not r2["skipped"] and r2["from_version"] == r1["to_version"]
    # u2's stale text forgotten, new text re-gated in; u4 gone
    assert _texts(corpus) == {T1, T2_NEW}
    assert sync_corpus(spark, pages, corpus)["skipped"]

    # the corpus ledger carries both phases of the range
    batches = corpus.manifest().committed_batches
    assert any(b.startswith("forget-pages-v") for b in batches)


def test_update_not_rejected_against_own_stale_version(spark):
    """A minor re-crawl (near-dup of its OWN previous version, one token
    appended) must re-enter the corpus: forget-before-ingest prevents
    self-rejection. A byte-identical re-crawl (rank-only update) is a
    corpus NO-OP — neither forgotten nor re-gated."""
    ppath = os.path.join(tempfile.mkdtemp(prefix="csync2_p_"), "pages")
    cpath = os.path.join(tempfile.mkdtemp(prefix="csync2_c_"), "corpus")
    pages = PagesTable.create(spark, ppath, num_buckets=4)
    corpus = CorpusTable.create(spark, cpath)
    long_t1 = T1 + " " + T2 + " " + T4  # ~20 tokens: stable near-dup sigs
    pages.apply_batch(
        "b0", _ev(spark, [(1, 0, "I", "u1", "2024-01-01T00:00", long_t1)])
    )
    sync_corpus(spark, pages, corpus)
    # byte-identical re-crawl: rank advances (change_op U), text equal
    pages.apply_batch(
        "b1", _ev(spark, [(2, 1, "U", "u1", "2024-03-01T00:00", long_t1)])
    )
    r = sync_corpus(spark, pages, corpus)
    assert r["ingest"]["accepted"] == 0 and r["ingest"]["rejected"] == 0
    assert corpus.manifest().n_docs == 1
    # minor edit: near-dup of its own previous version must be ACCEPTED
    edited = long_t1 + " appended"
    pages.apply_batch(
        "b2", _ev(spark, [(3, 2, "U", "u1", "2024-04-01T00:00", edited)])
    )
    r2 = sync_corpus(spark, pages, corpus)
    assert r2["ingest"]["accepted"] == 1
    assert _texts(corpus) == {edited}
    assert corpus.manifest().n_docs == 1


def test_forget_is_ledgered_and_idempotent(spark):
    cpath = os.path.join(tempfile.mkdtemp(prefix="csync3_c_"), "corpus")
    corpus = CorpusTable.create(spark, cpath)
    docs = spark.createDataFrame(
        [(1, T1), (2, T2), (3, T4)], "doc_id long, text string"
    )
    corpus.apply_batch("seed", docs)
    r = corpus.forget("f1", [2])
    assert (r["skipped"], r["forgotten"]) == (False, 1)
    assert _texts(corpus) == {T1, T4}
    assert corpus.forget("f1", [2])["skipped"]  # redelivery no-op
    # forgotten ids leave the band index too: an exact re-submission of
    # the forgotten text is ACCEPTED again (nothing left to collide with)
    r2 = corpus.apply_batch(
        "seed2", spark.createDataFrame([(9, T2)], "doc_id long, text string")
    )
    assert r2["accepted"] == 1
    assert _texts(corpus) == {T1, T2, T4}


def test_forget_prunes_untouched_files_via_footer_stats(spark):
    """Footer min/max id statistics exclude doc files the forget set
    cannot touch: their manifest entries (and bytes) stay identical."""
    cpath = os.path.join(tempfile.mkdtemp(prefix="csync4_c_"), "corpus")
    corpus = CorpusTable.create(spark, cpath)
    corpus.apply_batch(
        "lo",
        spark.createDataFrame([(1, T1), (2, T2)], "doc_id long, text string"),
    )
    corpus.apply_batch(
        "hi",
        spark.createDataFrame(
            [(100, T4), (101, T2_NEW)], "doc_id long, text string"
        ),
    )
    files_before = list(corpus.manifest().doc_files)
    r = corpus.forget("f-hi", [101])
    assert r["forgotten"] == 1
    assert r["files_rewritten"] == 1 and r["files_pruned"] == 1
    files_after = corpus.manifest().doc_files
    # the low-range file survives BY REFERENCE; the high one was rewritten
    assert files_before[0] in files_after
    assert files_before[1] not in files_after
    assert _texts(corpus) == {T1, T2, T4}
    assert corpus.manifest().n_docs == 3

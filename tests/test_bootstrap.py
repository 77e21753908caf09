"""Snapshot bootstrap + binlog cutover: a table bootstrapped from a
consistent snapshot at offset (file_seq, log_pos) and then tailed from
that offset must equal a full from-scratch replay — at a file-boundary
offset AND a mid-file transaction-boundary offset."""

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from mysql_syncer_spark.generator import GenSpec, generate_events, write_event_log
from mysql_syncer_spark.plans.replay import bootstrap_then_replay, replay
from mysql_syncer_spark.sink.pages_table import PagesTable


@pytest.fixture(scope="module")
def log_dir():
    d = tempfile.mkdtemp(prefix="bootlog_")
    write_event_log(generate_events(GenSpec(n_events=4_000, events_per_file=800)), d)
    return d


@pytest.fixture(scope="module")
def full_state(spark, log_dir):
    path = os.path.join(tempfile.mkdtemp(prefix="bootfull_"), "pages")
    replay(spark, log_dir, path, num_buckets=8)
    return {r["url"]: r.asDict() for r in PagesTable(spark, path).read().collect()}


def _state_at_offset(spark, log_dir, offset, raw=True):
    """Reference snapshot: replay only events at or before the offset.
    ``raw=True`` hands over the full state incl. tombstones (the
    production shape); ``raw=False`` is the lossy live-view handoff."""
    fs, pos = offset
    path = os.path.join(tempfile.mkdtemp(prefix="bootsnap_"), "pages")

    def upto(df):
        return df.filter(
            (F.col("file_seq") < fs)
            | ((F.col("file_seq") == fs) & (F.col("log_pos") <= pos))
        )

    replay(spark, log_dir, path, num_buckets=8, event_filter=upto)
    t = PagesTable(spark, path)
    m = t.manifest()
    snap = t.state() if raw else t.read()
    return snap, dict(m.column_mapping), [list(r) for r in m.renames]


def _assert_equals_full(spark, snap3, offset, log_dir, full_state):
    snapshot, wire_mapping, renames = snap3
    path = os.path.join(tempfile.mkdtemp(prefix="bootcut_"), "pages")
    res = bootstrap_then_replay(
        spark, snapshot, offset, log_dir, path, num_buckets=8,
        wire_mapping=wire_mapping, renames=renames,
    )
    assert res["bootstrap"]["skipped"] is not True
    got = {r["url"]: r.asDict() for r in PagesTable(spark, path).read().collect()}
    assert set(got) == set(full_state)
    for url, row in full_state.items():
        assert got[url] == row, (url, got[url], row)
    return path


def test_bootstrap_at_file_boundary(spark, log_dir, full_state):
    events = spark.read.parquet(os.path.join(log_dir, "binlog-000002.parquet"))
    pos = events.agg(F.max("log_pos")).head()[0]
    offset = (2, int(pos))
    snapshot = _state_at_offset(spark, log_dir, offset)
    _assert_equals_full(spark, snapshot, offset, log_dir, full_state)


def test_bootstrap_mid_file_txn_boundary(spark, log_dir, full_state):
    # pick a transaction that ends inside file 3 (not the file's last tx,
    # not one spanning into file 4) and cut at its last event
    ev3 = spark.read.parquet(os.path.join(log_dir, "binlog-000003.parquet"))
    bounds = (
        ev3.filter(F.col("tx_id").isNotNull())
        .groupBy("tx_id")
        .agg(F.max("log_pos").alias("mx"))
        .orderBy("tx_id")
        .collect()
    )
    assert len(bounds) > 4
    cut_tx = bounds[len(bounds) // 2]
    offset = (3, int(cut_tx["mx"]))
    snapshot = _state_at_offset(spark, log_dir, offset)
    _assert_equals_full(spark, snapshot, offset, log_dir, full_state)


def test_bootstrap_preserves_out_of_order_deletes(spark):
    """A pre-offset DELETE whose warc_ts outranks every post-offset event
    for its key must survive the handoff (seed 41 @ the file-2 boundary
    hits this): the raw-state snapshot carries it as a tombstone event,
    while a live-view handoff demonstrably resurrects the key."""
    d = tempfile.mkdtemp(prefix="bootlog41_")
    write_event_log(
        generate_events(GenSpec(n_events=4_000, events_per_file=800, seed=41)), d
    )
    full_path = os.path.join(tempfile.mkdtemp(prefix="bootfull41_"), "pages")
    replay(spark, d, full_path, num_buckets=8)
    full = {
        r["url"]: r.asDict() for r in PagesTable(spark, full_path).read().collect()
    }
    ev2 = spark.read.parquet(os.path.join(d, "binlog-000002.parquet"))
    offset = (2, int(ev2.agg(F.max("log_pos")).head()[0]))

    raw3 = _state_at_offset(spark, d, offset, raw=True)
    path = os.path.join(tempfile.mkdtemp(prefix="bootcut41_"), "pages")
    bootstrap_then_replay(
        spark, raw3[0], offset, d, path, num_buckets=8,
        wire_mapping=raw3[1], renames=raw3[2],
    )
    got = {r["url"]: r.asDict() for r in PagesTable(spark, path).read().collect()}
    assert set(got) == set(full)
    for url, row in full.items():
        assert got[url] == row, (url, got[url], row)

    # the lossy live-view handoff resurrects at least one deleted key on
    # this fixture — proving the test actually exercises the failure mode
    live3 = _state_at_offset(spark, d, offset, raw=False)
    lpath = os.path.join(tempfile.mkdtemp(prefix="bootlive41_"), "pages")
    bootstrap_then_replay(
        spark, live3[0], offset, d, lpath, num_buckets=8,
        wire_mapping=live3[1], renames=live3[2],
    )
    lgot = {r["url"] for r in PagesTable(spark, lpath).read().collect()}
    assert lgot - set(full), "fixture no longer exercises out-of-order deletes"


def test_bootstrap_refuses_existing_table(spark, log_dir):
    path = os.path.join(tempfile.mkdtemp(prefix="bootdup_"), "pages")
    PagesTable.create(spark, path, num_buckets=4)
    snap = spark.createDataFrame([], "url string, warc_ts timestamp, html binary, text string, lang string")
    with pytest.raises(ValueError):
        bootstrap_then_replay(spark, snap, (1, 0), log_dir, path)


def test_bootstrap_batch_is_ledgered_idempotent(spark, log_dir, full_state):
    events = spark.read.parquet(os.path.join(log_dir, "binlog-000002.parquet"))
    pos = int(events.agg(F.max("log_pos")).head()[0])
    snap3 = _state_at_offset(spark, log_dir, (2, pos))
    path = _assert_equals_full(spark, snap3, (2, pos), log_dir, full_state)
    snapshot = snap3[0]
    # re-applying the bootstrap batch on the SAME table is a committed no-op
    from mysql_syncer_spark.plans.replay import default_pages_config, snapshot_events

    t = PagesTable(spark, path)
    again = t.apply_batch(
        batch_id=f"bootstrap-2-{pos}",
        events=snapshot_events(snapshot, (2, pos)),
        cfg=default_pages_config(),
    )
    assert again["skipped"] is True

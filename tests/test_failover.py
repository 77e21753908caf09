"""Multi-source GTID failover merge: overlapping primary + promoted-
replica binlog archives dedup to an exactly-once stream in commit (gno)
order, and the recovery replay equals the single-log oracle.

The fixture mirrors the real failover shape: the replica's archive
re-frames the overlap window's transactions in its OWN files (different
file_seq numbering, different byte positions) while GTIDs are preserved
(start_gno continues the primary's sequence)."""

import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import functions as F

from mysql_syncer_spark.generator import GenSpec, generate_events
from mysql_syncer_spark.operators.failover import (
    merge_gtid_streams,
    replay_failover,
)
from mysql_syncer_spark.sources.binlog_file import (
    encode_binlog_files,
    read_binlog_files,
)

UUID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def _slice_files(tbl: pa.Table, lo: int, hi: int, renumber_from=None) -> pa.Table:
    m = pc.and_(
        pc.greater_equal(tbl["file_seq"], lo), pc.less_equal(tbl["file_seq"], hi)
    )
    out = tbl.filter(m)
    if renumber_from is not None:
        i = out.schema.get_field_index("file_seq")
        shifted = pc.add(pc.subtract(out["file_seq"], lo), renumber_from)
        out = out.set_column(i, "file_seq", shifted.cast(pa.int32()))
    return out


def _fixture(spark, tmp_path, n_events=1500, files=5, overlap=(2, 3)):
    """Full log of `files` files; primary archive = files 0..overlap[1],
    replica archive = files overlap[0]..end renumbered from 0 with the
    GTID sequence continued. Returns (typed_tbl, primary_dir, replica_dir)."""
    tbl = generate_events(
        GenSpec(n_events=n_events, events_per_file=n_events // files)
    )
    pri = str(tmp_path / "primary")
    rep = str(tmp_path / "replica")
    encode_binlog_files(
        _slice_files(tbl, 0, overlap[1]), pri, gtid_uuid=UUID, server_id=1
    )
    # gnos committed before the replica's first file = what the promoted
    # replica's PREVIOUS_GTIDS must cover; read it off the primary BYTES
    pre = read_binlog_files(
        spark, pri, include_gtid=True, to_file_seq=overlap[0] - 1
    )
    start_gno = pre.select(
        F.max(F.split("gtid", ":").getItem(1).cast("long")).alias("g")
    ).collect()[0]["g"]
    encode_binlog_files(
        _slice_files(tbl, overlap[0], files - 1, renumber_from=0),
        rep,
        gtid_uuid=UUID,
        server_id=2,
        start_gno=int(start_gno),
    )
    return tbl, pri, rep


def test_merge_exactly_once_in_commit_order(spark, tmp_path):
    tbl, pri, rep = _fixture(spark, tmp_path)
    env_p = read_binlog_files(spark, pri, include_gtid=True)
    env_r = read_binlog_files(spark, rep, include_gtid=True)
    merged = merge_gtid_streams([env_p, env_r])

    # the full gno range is covered exactly once: every gtid from one src
    per_gtid = (
        merged.groupBy("gtid")
        .agg(
            F.countDistinct("src_priority").alias("n_src"),
            F.first("commit_seq").alias("gno"),
        )
        .collect()
    )
    assert all(r["n_src"] == 1 for r in per_gtid)
    gnos = sorted(r["gno"] for r in per_gtid)
    assert gnos == list(range(1, len(gnos) + 1)), "gno gap or dup"

    # overlap window resolved to the PRIMARY (priority 0); the replica
    # contributes exactly the post-primary tail
    max_pri_gno = (
        env_p.select(F.max(F.split("gtid", ":").getItem(1).cast("long")))
        .collect()[0][0]
    )
    srcs = {r["gno"]: None for r in per_gtid}
    for r in merged.select("commit_seq", "src_priority").distinct().collect():
        srcs[r["commit_seq"]] = r["src_priority"]
    for gno, src in srcs.items():
        assert src == (0 if gno <= max_pri_gno else 1), (gno, src)

    # row-level content equality with the full single-server log
    full_dir = str(tmp_path / "full")
    encode_binlog_files(tbl, full_dir, gtid_uuid=UUID, server_id=1)
    want = read_binlog_files(spark, full_dir, include_gtid=True)
    key = lambda df: sorted(
        (r["gtid"], r["op"], r["table"], bytes(r["rows_event"] or b""))
        for r in df.collect()
    )
    assert key(merged) == key(want)


def test_merge_is_two_stage_gtid_keyed(spark, tmp_path):
    """Plan shape: no Window over the stream, no cartesian — an
    aggregate + one equi-join, both keyed on gtid (the 100 TB shape)."""
    _, pri, rep = _fixture(spark, tmp_path, n_events=500)
    merged = merge_gtid_streams(
        [
            read_binlog_files(spark, pri, include_gtid=True),
            read_binlog_files(spark, rep, include_gtid=True),
        ]
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Window" not in plan


def test_replay_failover_matches_single_log_oracle(spark, tmp_path):
    """Recovery replay over BOTH archives == the typed-log engine replay
    (final state per url), despite the replica's private renumbering."""
    from mysql_syncer_spark.generator import write_event_log
    from mysql_syncer_spark.plans.replay import replay
    from mysql_syncer_spark.sink.pages_table import PagesTable

    tbl, pri, rep = _fixture(spark, tmp_path)
    tdir = tempfile.mkdtemp(prefix="fo_typed_")
    write_event_log(tbl, tdir)
    tpath = os.path.join(tempfile.mkdtemp(prefix="fo_t_"), "pages")
    replay(spark, tdir, tpath, num_buckets=8)
    want = {
        r["url"]: (r["warc_ts"], r["lang"], r["extra_v2"])
        for r in PagesTable(spark, tpath).read().collect()
    }

    fpath = os.path.join(tempfile.mkdtemp(prefix="fo_f_"), "pages")
    replay_failover(spark, [pri, rep], fpath, num_buckets=8)
    got = {
        r["url"]: (r["warc_ts"], r["lang"], r["extra_v2"])
        for r in PagesTable(spark, fpath).read().collect()
    }
    assert got == want


def test_priorities_prefer_listed_order(spark, tmp_path):
    """Reversed priorities flip the overlap window's winning source."""
    _, pri, rep = _fixture(spark, tmp_path, n_events=500)
    env_p = read_binlog_files(spark, pri, include_gtid=True)
    env_r = read_binlog_files(spark, rep, include_gtid=True)
    merged = merge_gtid_streams([env_p, env_r], priorities=[1, 0])
    # every gtid the replica has must now come from the replica
    rep_gtids = {r["gtid"] for r in env_r.select("gtid").distinct().collect()}
    for r in merged.select("gtid", "src_priority").distinct().collect():
        if r["gtid"] in rep_gtids:
            assert r["src_priority"] == 0

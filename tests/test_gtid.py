"""GTID layer over the raw binlog FILE framing (MySQL 5.6+ extension —
the C reference is file+pos only): set codec, encoder framing, scanner
stamping, header-probe index, and resume-from-GTID position lookup."""

import os
import struct
import tempfile

import pytest

from mysql_syncer_spark.generator import GenSpec, generate_events
from mysql_syncer_spark.sources.binlog_file import (
    GTID_EVENT,
    PREVIOUS_GTIDS_EVENT,
    decode_gtid_set,
    encode_binlog_files,
    encode_gtid_set,
    gtid_in_set,
    gtid_position,
    gtid_set_str,
    read_binlog_files,
    read_previous_gtids,
    scan_binlog_bytes,
)

UUID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
UUID2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"


def _spec(**kw):
    kw.setdefault("n_events", 400)
    kw.setdefault("events_per_file", 100)
    return GenSpec(**kw)


def _encode(tmp=None, **kw):
    tbl = generate_events(_spec())
    d = tmp or tempfile.mkdtemp(prefix="gtid_")
    encode_binlog_files(tbl, d, gtid_uuid=UUID, **kw)
    return tbl, d


def test_gtid_set_codec_roundtrip():
    s = {UUID: [(1, 6), (8, 9)], UUID2: [(3, 4)]}
    b = encode_gtid_set(s)
    assert decode_gtid_set(b) == s
    assert gtid_set_str(s) == f"{UUID}:1-5:8,{UUID2}:3"
    assert gtid_in_set(s, f"{UUID}:5")
    assert gtid_in_set(s, f"{UUID}:8")
    assert not gtid_in_set(s, f"{UUID}:6")
    assert not gtid_in_set(s, f"{UUID2}:4")
    assert not gtid_in_set(s, f"{UUID2.replace('a', '1')}:3")
    assert decode_gtid_set(encode_gtid_set({})) == {}


def test_encoder_frames_gtids_in_commit_order():
    tbl, d = _encode()
    files = sorted(
        f for f in os.listdir(d) if f.startswith("mysql-bin.") and
        not f.endswith(".index")
    )
    seen_gnos = []
    prev_sets = []
    for f in files:
        content = open(os.path.join(d, f), "rb").read()
        seq = int(f.rsplit(".", 1)[1])
        prev_sets.append(read_previous_gtids(content))
        for ev in scan_binlog_bytes(content, seq):
            if ev["kind"] == "GTID":
                sid, gno = ev["gtid"].rsplit(":", 1)
                assert sid == UUID
                seen_gnos.append(int(gno))
    # gnos are 1..k in commit order across the whole log
    assert seen_gnos == list(range(1, len(seen_gnos) + 1))
    # each file's PREVIOUS_GTIDS == everything committed in PRIOR files
    assert prev_sets[0] == {}
    committed = 0
    for i, f in enumerate(files[:-1]):
        content = open(os.path.join(d, f), "rb").read()
        committed += sum(
            1
            for ev in scan_binlog_bytes(content, 0)
            if ev["kind"] == "GTID"
        )
        assert prev_sets[i + 1] == {UUID: [(1, committed + 1)]}


def test_scanner_stamps_every_row_and_ddl_event():
    tbl, d = _encode()
    files = sorted(
        f for f in os.listdir(d) if f.startswith("mysql-bin.") and
        not f.endswith(".index")
    )
    n_rows = 0
    for f in files:
        content = open(os.path.join(d, f), "rb").read()
        cur = None
        for ev in scan_binlog_bytes(content, int(f.rsplit(".", 1)[1])):
            if ev["kind"] == "GTID":
                cur = ev["gtid"]
            elif ev["op"] in ("I", "U", "D", "DDL"):
                n_rows += 1
                assert ev["gtid"] == cur, (ev["kind"], ev["log_pos"])
                if ev["op"] == "DDL":
                    cur = None  # DDL consumed its own gno
            elif ev["kind"] == "XID":
                assert ev["gtid"] == cur
                cur = None
    assert n_rows > 0


def test_gtidless_log_scans_unchanged():
    """Default encode (no gtid_uuid) emits NO GTID events — the census
    contract fixture stays byte-stable — and every gtid stamp is None."""
    tbl = generate_events(_spec())
    d = tempfile.mkdtemp(prefix="gtidless_")
    encode_binlog_files(tbl, d)
    f = sorted(
        x for x in os.listdir(d) if not x.endswith(".index")
    )[0]
    content = open(os.path.join(d, f), "rb").read()
    evs = scan_binlog_bytes(content, 0)
    assert all(ev["kind"] not in ("GTID", "PREVIOUS_GTIDS") for ev in evs)
    assert all(ev["gtid"] is None for ev in evs)
    assert read_previous_gtids(content) == {}


def test_envelope_gtid_column_is_opt_in(spark):
    tbl, d = _encode()
    env = read_binlog_files(spark, d)
    assert "gtid" not in env.columns
    envg = read_binlog_files(spark, d, include_gtid=True)
    assert envg.schema["gtid"].dataType.typeName() == "string"
    rows = envg.where("op in ('I','U','D')").select("gtid").collect()
    assert rows and all(
        r["gtid"] and r["gtid"].startswith(UUID + ":") for r in rows
    )


def test_gtid_position_resume_parity(spark):
    """Resume-after-G: scanning from gtid_position(G) onward yields
    exactly the row/DDL events of transactions AFTER G — file-pruned via
    the PREVIOUS_GTIDS index, then one file scan."""
    tbl, d = _encode()
    files = sorted(
        f for f in os.listdir(d) if not f.endswith(".index")
    )
    # full ordered event stream with gtids
    all_evs = []
    for f in files:
        content = open(os.path.join(d, f), "rb").read()
        seq = int(f.rsplit(".", 1)[1])
        all_evs.extend(
            (ev, content) for ev in scan_binlog_bytes(content, seq)
        )
    gnos = sorted(
        {
            int(ev["gtid"].rsplit(":", 1)[1])
            for ev, _ in all_evs
            if ev["gtid"]
        }
    )
    # pick a mid-log transaction (inside file 2 of 4)
    target_gno = gnos[len(gnos) // 2]
    gtid = f"{UUID}:{target_gno}"
    seq, off = gtid_position(spark, d, gtid)
    assert 0 < seq <= int(files[-1].rsplit(".", 1)[1])

    # events at/after the resume point (target file suffix + later files)
    resumed = []
    for f in files:
        fseq = int(f.rsplit(".", 1)[1])
        if fseq < seq:
            continue
        content = open(os.path.join(d, f), "rb").read()
        from_pos = off if fseq == seq else 0
        resumed.extend(
            ev
            for ev in scan_binlog_bytes(content, fseq, from_pos=from_pos)
            if ev["op"] in ("I", "U", "D", "DDL")
        )
    expected = [
        ev
        for ev, _ in all_evs
        if ev["op"] in ("I", "U", "D", "DDL")
        and ev["gtid"]
        and int(ev["gtid"].rsplit(":", 1)[1]) > target_gno
    ]
    assert [(e["op"], e["file_seq"], e["log_pos"]) for e in resumed] == [
        (e["op"], e["file_seq"], e["log_pos"]) for e in expected
    ]

    # boundary: resuming after the LAST gtid leaves nothing
    seq_last, off_last = gtid_position(spark, d, f"{UUID}:{gnos[-1]}")
    content = open(os.path.join(d, files[-1]), "rb").read()
    tail = [
        ev
        for ev in scan_binlog_bytes(
            content, seq_last, from_pos=off_last
        )
        if ev["op"] in ("I", "U", "D", "DDL")
    ]
    assert tail == []

    with pytest.raises(KeyError):
        gtid_position(spark, d, f"{UUID}:99999")


def test_previous_gtids_probe_is_header_only():
    """The probe must stop at the header block: feed it a file whose
    byte tail is CORRUPT beyond the first row event — a full-file walk
    would raise, the header probe must not."""
    tbl, d = _encode()
    f = sorted(x for x in os.listdir(d) if not x.endswith(".index"))[1]
    content = bytearray(open(os.path.join(d, f), "rb").read())
    content = content[: len(content) // 2] + b"\xff" * 7  # torn tail
    got = read_previous_gtids(bytes(content))
    assert got and gtid_in_set(got, f"{UUID}:1")


def _state(spark, path):
    from mysql_syncer_spark.sink.pages_table import PagesTable

    return {
        r["url"]: (r["warc_ts"], r["lang"])
        for r in PagesTable(spark, path).read().collect()
    }


def test_replay_binlog_end_to_end_and_gtid_resume(spark):
    """plans.replay_binlog: full replay from raw file bytes equals the
    typed replay; a consumer that died after transaction G resumes with
    after_gtid and converges to the same final state, with the partial
    first batch under an offset-qualified ledger id."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.generator import write_event_log
    from mysql_syncer_spark.plans.replay import replay, replay_binlog
    from mysql_syncer_spark.sink.pages_table import PagesTable
    from mysql_syncer_spark.sources.wire_log import decode_wire_events

    tbl, d = _encode()

    tdir = tempfile.mkdtemp(prefix="gtid_typed_")
    write_event_log(tbl, tdir)
    tpath = os.path.join(tempfile.mkdtemp(prefix="gtid_t_"), "pages")
    replay(spark, tdir, tpath, num_buckets=8)
    want = _state(spark, tpath)

    p_full = os.path.join(tempfile.mkdtemp(prefix="gtid_f_"), "pages")
    r_full = replay_binlog(spark, d, p_full, num_buckets=8)
    assert r_full["n_batches"] == 4 and r_full["resumed_at"] is None
    assert _state(spark, p_full) == want

    # pick a transaction inside file 1 (of 0..3) as the death point
    env = read_binlog_files(spark, d, include_gtid=True)
    gno_col = F.split("gtid", ":").getItem(1).cast("long")
    g = (
        env.where("file_seq = 1")
        .select(F.max(gno_col).alias("g"))
        .collect()[0]["g"]
    )
    gtid = f"{UUID}:{g}"

    p_res = os.path.join(tempfile.mkdtemp(prefix="gtid_r_"), "pages")
    t = PagesTable.create(spark, p_res, num_buckets=8)
    t.apply_batch("prefix", decode_wire_events(env.where(gno_col <= g)))
    r = replay_binlog(spark, d, p_res, num_buckets=8, after_gtid=gtid)
    assert _state(spark, p_res) == want
    seq0, off0 = r["resumed_at"]
    assert (seq0, r["n_batches"]) in {(1, 3), (2, 2)}
    if seq0 == 1:  # partial first file: offset-qualified batch id
        assert r["batches"][0]["batch_id"] == f"fileseq-1@{off0}"


def test_streaming_resume_after_gtid(spark):
    """STREAMING twin of the batch resume: a consumer that died after
    transaction G restarts the byte-level tail with ``resume_filter``
    composed in front of the wire decode — already-applied events are
    dropped by the predicate (the streaming source discovers whole
    files; the filter enforces the mid-file boundary) and the table
    converges to the full-replay state."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.generator import write_event_log
    from mysql_syncer_spark.plans.replay import replay
    from mysql_syncer_spark.sink.pages_table import PagesTable
    from mysql_syncer_spark.sources.binlog_file import (
        resume_filter,
        stream_binlog_files,
    )
    from mysql_syncer_spark.sources.wire_log import decode_wire_events
    from mysql_syncer_spark.streaming.runner import run_streaming_replay

    tbl, d = _encode()

    tdir = tempfile.mkdtemp(prefix="gtid_styped_")
    write_event_log(tbl, tdir)
    tpath = os.path.join(tempfile.mkdtemp(prefix="gtid_st_"), "pages")
    replay(spark, tdir, tpath, num_buckets=8)
    want = _state(spark, tpath)

    # death point: last transaction of file 1
    env = read_binlog_files(spark, d, include_gtid=True)
    gno_col = F.split("gtid", ":").getItem(1).cast("long")
    g = (
        env.where("file_seq = 1")
        .select(F.max(gno_col).alias("g"))
        .collect()[0]["g"]
    )
    seq, off = gtid_position(spark, d, f"{UUID}:{g}")

    work = tempfile.mkdtemp(prefix="gtid_stream_")
    p_res = os.path.join(work, "pages")
    t = PagesTable.create(spark, p_res, num_buckets=8)
    t.apply_batch("prefix", decode_wire_events(env.where(gno_col <= g)))

    run_streaming_replay(
        spark,
        d,
        p_res,
        os.path.join(work, "ckpt"),
        num_buckets=8,
        timeout_sec=180,
        transform=lambda df: decode_wire_events(
            resume_filter(seq, off)(df)
        ),
        source=stream_binlog_files(spark, d),
    )
    assert _state(spark, p_res) == want

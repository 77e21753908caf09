"""MySQL 5.6+ binlog event checksums (BINLOG_CHECKSUM_ALG_CRC32, the
server default since 5.6): encoder opt-in, scanner auto-detect from the
FDE server-version + alg byte, per-event CRC32 verification, corruption
detection. Pure-function tests — no Spark session needed."""

import os
import struct
import tempfile

import pytest

from mysql_syncer_spark.generator import GenSpec, generate_events
from mysql_syncer_spark.sources.binlog_file import (
    MAGIC,
    HEADER_LEN,
    _detect_crc32,
    encode_binlog_files,
    read_previous_gtids,
    scan_binlog_bytes,
)

UUID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def _encode(checksum, **kw):
    tbl = generate_events(GenSpec(n_events=300, events_per_file=100))
    d = tempfile.mkdtemp(prefix="crc_")
    encode_binlog_files(tbl, d, checksum=checksum, **kw)
    return d


def _bytes(d, seq=0):
    with open(os.path.join(d, f"mysql-bin.{seq:06d}"), "rb") as f:
        return f.read()


def _typed(events):
    return [
        (e["kind"], e["op"], e["table"], e["tx_id"], e["rows_event"],
         e["query"], e["n_images"])
        for e in events
        if e["kind"] != "FORMAT_DESCRIPTION"
    ]


def test_checksummed_scan_equals_plain_scan():
    """Same typed content decodes from a CRC32-framed file as from a
    5.5-era plain file (positions differ — every event grows 4 bytes)."""
    plain = _encode(None)
    crc = _encode("crc32")
    for seq in range(3):
        a = scan_binlog_bytes(_bytes(plain, seq), seq)
        b = scan_binlog_bytes(_bytes(crc, seq), seq)
        assert _typed(a) == _typed(b)
    assert not _detect_crc32(_bytes(plain))
    assert _detect_crc32(_bytes(crc))


def test_corruption_raises():
    d = _encode("crc32")
    content = bytearray(_bytes(d))
    # flip one byte deep in the stream (past the FDE)
    content[len(content) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        scan_binlog_bytes(bytes(content), 0)
    # a plain file does NOT false-positive on the same flip (no CRC to
    # check; the event walk either tolerates or reports truncation)
    d2 = _encode(None)
    c2 = bytearray(_bytes(d2))
    assert not _detect_crc32(bytes(c2))


def test_gtid_header_probe_tolerates_crc_trailer():
    """PREVIOUS_GTIDS decode is count-driven: the 4-byte CRC trailer on
    the header events does not disturb the file-level GTID index."""
    tbl = generate_events(GenSpec(n_events=300, events_per_file=100))
    d = tempfile.mkdtemp(prefix="crc_g_")
    encode_binlog_files(tbl, d, gtid_uuid=UUID, checksum="crc32")
    s0 = read_previous_gtids(_bytes(d, 0))
    s2 = read_previous_gtids(_bytes(d, 2))
    assert s0 == {}  # nothing committed before file 0
    assert UUID in s2 and s2[UUID][0][0] == 1
    # and the scanner stamps gtids identically to the unchecksummed form
    dn = tempfile.mkdtemp(prefix="crc_gn_")
    encode_binlog_files(tbl, dn, gtid_uuid=UUID)
    a = scan_binlog_bytes(_bytes(dn, 1), 1)
    b = scan_binlog_bytes(_bytes(d, 1), 1)
    assert [e["gtid"] for e in a] == [e["gtid"] for e in b]


def test_fde_version_gates_detection():
    """A file whose FDE reports a pre-5.6.1 server is never read as
    checksummed, even if its last body byte happens to be 1."""
    d = _encode(None)
    content = _bytes(d)
    # craft: body[-5] of the FDE == 1 on a 5.5 file
    p = len(MAGIC)
    el = struct.unpack_from("<IBIIIH", content, p)[3]
    mut = bytearray(content)
    mut[p + el - 5] = 1
    assert not _detect_crc32(bytes(mut))


def test_replay_from_checksummed_binlog(spark, tmp_path):
    """End to end: engine replay from CRC32-framed file bytes equals the
    typed replay — the full distributed path auto-detects per file."""
    from mysql_syncer_spark.generator import write_event_log
    from mysql_syncer_spark.plans.replay import replay, replay_binlog
    from mysql_syncer_spark.sink.pages_table import PagesTable

    tbl = generate_events(GenSpec(n_events=400, events_per_file=200))
    tdir = str(tmp_path / "typed")
    write_event_log(tbl, tdir)
    tpath = str(tmp_path / "t" / "pages")
    replay(spark, tdir, tpath, num_buckets=4)
    want = {
        r["url"]: r.asDict()
        for r in PagesTable(spark, tpath).read().collect()
    }

    bdir = str(tmp_path / "bin")
    encode_binlog_files(tbl, bdir, checksum="crc32")
    bpath = str(tmp_path / "b" / "pages")
    replay_binlog(spark, bdir, bpath, num_buckets=4)
    got = {
        r["url"]: r.asDict()
        for r in PagesTable(spark, bpath).read().collect()
    }
    assert got == want

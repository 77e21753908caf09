"""F5 transaction gating: a transaction straddling a binlog rotation is
applied atomically — never split across two commits (reference gate
``!bi->tran`` at /root/reference/src/master/rs_parse_binlog.c:428)."""

import os
import tempfile

import pytest

from mysql_syncer_spark.generator import GenSpec, generate_events, write_event_log
from mysql_syncer_spark.oracle import _to_us, sequential_replay
from mysql_syncer_spark.plans.replay import iter_tx_gated_batches, replay
from mysql_syncer_spark.sink.pages_table import PagesTable

# tx size is 7 (generator: tx_id = idx // 7); 10 events/file makes nearly
# every rotation split a transaction
SPEC = GenSpec(n_events=60, events_per_file=10, p_duplicate=0.0)


@pytest.fixture(scope="module")
def gated_log(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("txlog"))
    tbl = generate_events(SPEC)
    write_event_log(tbl, d)
    return d, tbl


def test_no_transaction_spans_two_batches(spark, gated_log):
    d, _ = gated_log
    seen: dict[int, int] = {}  # tx_id -> batch seq it appeared in
    last_seq = -1
    for seq, batch in iter_tx_gated_batches(spark, d):
        assert seq > last_seq
        last_seq = seq
        for r in batch.select("tx_id").distinct().collect():
            if r["tx_id"] is None:
                continue  # DDL events sit outside transactions
            tx = int(r["tx_id"])
            assert tx not in seen, f"tx {tx} split across batches {seen[tx]}/{seq}"
            seen[tx] = seq
    # every transaction in the log arrived in exactly one batch
    assert len(seen) == (SPEC.n_events + 6) // 7


def test_straddling_tx_held_back_whole(spark, gated_log):
    d, tbl = gated_log
    batches = list(iter_tx_gated_batches(spark, d))
    # file 0 covers idx 0..9 → tx 1 (idx 7..13) straddles into file 1
    b0 = batches[0][1]
    assert b0.filter("tx_id = 1").count() == 0
    b1 = batches[1][1]
    assert b1.filter("tx_id = 1").count() == 7


def test_kill_between_batches_leaves_no_half_transaction(spark, gated_log):
    """Apply ONLY batch 0 (simulated crash before batch 1), then verify the
    committed state contains no event of the straddling transaction; a
    subsequent full replay() on the same table converges to the oracle."""
    d, tbl = gated_log
    table_path = os.path.join(tempfile.mkdtemp(prefix="txgate_"), "pages")
    table = PagesTable.create(spark, table_path, num_buckets=4)
    from mysql_syncer_spark.plans.replay import default_pages_config

    cfg = default_pages_config()
    seq0, b0 = next(iter_tx_gated_batches(spark, d))
    table.apply_batch(batch_id=f"fileseq-{seq0}", events=b0, cfg=cfg)

    # events of tx 1 (idx 7..13) must be entirely absent from the state:
    # no live row may carry an _lww rank belonging to tx 1's events
    tx1 = {
        (ev["file_seq"], ev["log_pos"])
        for ev in tbl.to_pylist()
        if ev["tx_id"] == 1
    }
    state = PagesTable(spark, table_path).state()
    applied = {
        (r["_lww_file"], r["_lww_pos"]) for r in state.collect()
    }
    assert not (tx1 & applied), "half-applied transaction visible after crash"

    # resume: full replay on the same table (ledger skips batch 0) → oracle
    replay(spark, d, table_path, num_buckets=4)
    oracle, _, _ = sequential_replay(tbl)
    rows = {r["url"]: r.asDict() for r in PagesTable(spark, table_path).read().collect()}
    assert set(rows) == set(oracle)
    for url, want in oracle.items():
        got = rows[url]
        for k, v in want.items():
            gv = got.get(k)
            if k == "warc_ts":
                gv, v = _to_us(gv), _to_us(v)
            assert gv == v, (url, k, gv, v)


def test_full_gated_replay_matches_oracle(spark, gated_log):
    d, tbl = gated_log
    table_path = os.path.join(tempfile.mkdtemp(prefix="txgate_full_"), "pages")
    replay(spark, d, table_path, num_buckets=4)
    oracle, _, _ = sequential_replay(tbl)
    rows = {r["url"] for r in PagesTable(spark, table_path).read().collect()}
    assert rows == set(oracle)


def test_gating_holds_for_arbitrary_file_layout(spark, gated_log, tmp_path):
    """A log whose files do NOT match the binlog-NNN naming (plan_batches
    falls back to a pruned file_seq scan) must still yield tx-closed
    batches — the fallback computes per-file tx bounds from one pruned
    aggregate instead of parquet footers."""
    import shutil

    d, _ = gated_log
    alt = str(tmp_path / "renamed")
    os.makedirs(alt)
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".parquet"):
            shutil.copy(os.path.join(d, fn), os.path.join(alt, f"part-{fn[7:13]}.snappy.parquet"))
    seen: dict[int, int] = {}
    n_batches = 0
    for seq, batch in iter_tx_gated_batches(spark, alt):
        n_batches += 1
        for r in batch.select("tx_id").distinct().collect():
            if r["tx_id"] is None:
                continue
            tx = int(r["tx_id"])
            assert tx not in seen, f"tx {tx} split across batches {seen[tx]}/{seq}"
            seen[tx] = seq
    assert n_batches == 6
    assert len(seen) == (SPEC.n_events + 6) // 7
    # and the straddling tx (tx 1, idx 7..13) really was deferred whole
    assert seen[1] == 1

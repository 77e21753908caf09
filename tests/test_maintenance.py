"""Table maintenance: vacuum (orphan GC) + ledger compaction keep
exactly-once semantics intact."""

import os

from mysql_syncer_spark.oracle import sequential_replay
from mysql_syncer_spark.plans.replay import replay
from mysql_syncer_spark.sink.pages_table import PagesTable
from tests.test_replay_parity import assert_state_equal


def test_vacuum_removes_old_versions_keeps_state(
    spark, event_log_dir, event_table, tmp_table_path
):
    replay(spark, event_log_dir, tmp_table_path, num_buckets=8)
    t = PagesTable(spark, tmp_table_path)
    data_root = os.path.join(tmp_table_path, "data")
    # MoR: deltas stay referenced until compaction folds them
    assert t.compact()["compacted_buckets"] > 0
    n_dirs_before = len(os.listdir(data_root))
    res = t.vacuum()
    assert res["freed_bytes"] > 0
    assert len(os.listdir(data_root)) < n_dirs_before
    oracle, _, _ = sequential_replay(event_table)
    assert_state_equal(t.read().collect(), oracle)
    # idempotent
    assert t.vacuum()["removed_dirs"] == []


def test_ledger_compaction_preserves_idempotence(spark, event_log_dir, tmp_table_path):
    replay(spark, event_log_dir, tmp_table_path, num_buckets=8)
    t = PagesTable(spark, tmp_table_path)
    n_before = t.read().count()
    res = t.compact_ledger()
    assert res["entries_after"] < res["entries_before"]
    assert res["watermarks"].get("fileseq", -1) >= 1
    assert t.manifest().committed_batches == []
    # replaying compacted batches must still be a no-op
    res2 = replay(spark, event_log_dir, tmp_table_path, num_buckets=8)
    assert all(b.get("skipped") for b in res2["batches"])
    assert t.read().count() == n_before

"""R1: one change stream carrying two tables routes to two targets; the
unregistered third table is skipped (hash-miss parity)."""

import os
import tempfile

import pyarrow as pa

from mysql_syncer_spark.config import TableConfig
from mysql_syncer_spark.generator import GenSpec, generate_events
from mysql_syncer_spark.oracle import sequential_replay
from mysql_syncer_spark.plans.replay import replay_multi
from mysql_syncer_spark.sink.pages_table import PagesTable
from tests.test_replay_parity import assert_state_equal


def _retable(tbl: pa.Table, name: str) -> pa.Table:
    i = tbl.schema.get_field_index("table")
    col = pa.array([name] * tbl.num_rows, pa.string())
    return tbl.set_column(i, "table", col)


def test_two_tables_routed_one_skipped(spark, tmp_path):
    a = generate_events(GenSpec(n_events=1200, seed=7, ddl_scenario=()))
    b = _retable(generate_events(GenSpec(n_events=800, seed=8, ddl_scenario=())), "web.assets")
    c = _retable(generate_events(GenSpec(n_events=400, seed=9, ddl_scenario=())), "web.unregistered")
    mixed = pa.concat_tables([a, b, c])
    from mysql_syncer_spark.generator import write_event_log

    d = str(tmp_path / "log")
    write_event_log(mixed, d)

    registry = {
        "web.pages": TableConfig(name="web.pages"),
        "web.assets": TableConfig(name="web.assets"),
    }
    base = str(tmp_path / "tables")
    res = replay_multi(spark, d, base, registry, num_buckets=4)
    assert set(res) == {"web.pages", "web.assets"}

    oracle_a, _, _ = sequential_replay(a, extract_text=False)
    oracle_b, _, _ = sequential_replay(b, extract_text=False)
    ta = PagesTable(spark, os.path.join(base, "web_pages"))
    tb = PagesTable(spark, os.path.join(base, "web_assets"))
    # no transform registered → text stays as shipped (None); compare raw
    assert_state_equal(ta.read().collect(), oracle_a)
    assert_state_equal(tb.read().collect(), oracle_b)
    # unregistered table left no target
    assert not os.path.exists(os.path.join(base, "web_unregistered"))


def test_multi_table_ddl_isolated_per_target(spark, tmp_path):
    """The upfront ddl_index must apply F1 (table ownership) and F3
    (oversized cap): pages' DDL must not leak into assets' schema, and an
    oversized DDL is dropped on BOTH the indexed and per-batch paths."""
    import pyspark.sql.functions as F

    huge = "z" * 3000  # > oversized_ddl_filter's 2048 cap
    a = generate_events(
        GenSpec(
            n_events=1200,
            seed=7,
            ddl_scenario=(
                (0.40, "add_column", "extra", None, "string"),
                (0.60, "add_column", huge, None, "string"),
            ),
            events_per_file=400,
        )
    )
    b = _retable(
        generate_events(GenSpec(n_events=800, seed=8, ddl_scenario=(), events_per_file=400)),
        "web.assets",
    )
    mixed = pa.concat_tables([a, b])
    from mysql_syncer_spark.generator import write_event_log

    d = str(tmp_path / "log")
    write_event_log(mixed, d)

    registry = {
        "web.pages": TableConfig(name="web.pages"),
        "web.assets": TableConfig(name="web.assets"),
    }
    base = str(tmp_path / "tables")
    replay_multi(spark, d, base, registry, num_buckets=4)

    pages_cols = {c for c, _ in PagesTable(spark, os.path.join(base, "web_pages")).manifest().schema}
    assets_cols = {c for c, _ in PagesTable(spark, os.path.join(base, "web_assets")).manifest().schema}
    assert "extra" in pages_cols
    assert "extra" not in assets_cols, "foreign table's DDL leaked into assets"
    assert huge not in pages_cols, "oversized DDL not dropped by the index scan"
    # assets' data is untouched by pages' DDL
    oracle_b, _, _ = sequential_replay(b, extract_text=False)
    tb = PagesTable(spark, os.path.join(base, "web_assets"))
    assert_state_equal(tb.read().collect(), oracle_b)


def test_multi_table_from_raw_binlog_files(spark, tmp_path):
    """replay_binlog_multi: one byte-level scan per binlog FILE shared
    across the registry — per-table final state equals the typed
    multi-table replay, the unregistered table leaves no target."""
    from mysql_syncer_spark.plans.replay import replay_binlog_multi
    from mysql_syncer_spark.sources.binlog_file import encode_binlog_files

    a = generate_events(GenSpec(n_events=900, seed=17, events_per_file=300,
                                ddl_scenario=()))
    b = _retable(
        generate_events(GenSpec(n_events=600, seed=18, events_per_file=300,
                                ddl_scenario=())),
        "web.assets",
    )
    c = _retable(
        generate_events(GenSpec(n_events=300, seed=19, events_per_file=300,
                                ddl_scenario=())),
        "web.unregistered",
    )
    mixed = pa.concat_tables([a, b, c])
    from mysql_syncer_spark.generator import write_event_log

    tdir = str(tmp_path / "typed")
    write_event_log(mixed, tdir)
    bdir = str(tmp_path / "bin")
    encode_binlog_files(mixed, bdir)

    registry = {
        "web.pages": TableConfig(name="web.pages"),
        "web.assets": TableConfig(name="web.assets"),
    }
    tbase = str(tmp_path / "typed_tables")
    replay_multi(spark, tdir, tbase, registry, num_buckets=4)
    bbase = str(tmp_path / "bin_tables")
    res = replay_binlog_multi(spark, bdir, bbase, registry, num_buckets=4)
    assert set(res) == {"web.pages", "web.assets"}

    for name in registry:
        sub = name.replace(".", "_")
        want = {
            r["url"]: r.asDict()
            for r in PagesTable(spark, os.path.join(tbase, sub)).read().collect()
        }
        got = {
            r["url"]: r.asDict()
            for r in PagesTable(spark, os.path.join(bbase, sub)).read().collect()
        }
        assert got == want, name
    assert not os.path.exists(os.path.join(bbase, "web_unregistered"))

    # idempotent re-run: every batch of every table skips
    res2 = replay_binlog_multi(spark, bdir, bbase, registry, num_buckets=4)
    assert all(
        batch.get("skipped") for rs in res2.values() for batch in rs
    )

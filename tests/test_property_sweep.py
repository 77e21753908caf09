"""Randomized/property-style sweep (SURVEY §5.2 item 5): engine == oracle
across op mixes, skew levels, out-of-order and duplicate fractions."""

import tempfile

import pytest

from mysql_syncer_spark.generator import GenSpec, generate_events, write_event_log
from mysql_syncer_spark.oracle import sequential_replay
from mysql_syncer_spark.plans.replay import replay
from mysql_syncer_spark.sink.pages_table import PagesTable
from tests.test_replay_parity import assert_state_equal

SWEEP = [
    # heavy updates, no deletes, strong skew
    GenSpec(n_events=2500, seed=101, p_update=0.8, p_delete=0.0, zipf_a=1.05,
            n_urls=300, events_per_file=900),
    # delete-heavy with many out-of-order arrivals
    GenSpec(n_events=2500, seed=202, p_update=0.3, p_delete=0.25,
            p_out_of_order=0.4, n_urls=400, events_per_file=700),
    # extreme duplicate redelivery, no DDL
    GenSpec(n_events=2000, seed=303, p_duplicate=0.3, ddl_scenario=(),
            n_urls=150, events_per_file=650),
    # single hot url flood (worst-case skew)
    GenSpec(n_events=2000, seed=404, n_urls=3, zipf_a=3.0, events_per_file=500),
]


@pytest.mark.parametrize("spec", SWEEP, ids=lambda s: f"seed{s.seed}")
def test_replay_equals_oracle(spark, spec):
    tbl = generate_events(spec)
    d = tempfile.mkdtemp(prefix=f"sweep{spec.seed}_")
    write_event_log(tbl, d)
    oracle, cols, _ = sequential_replay(tbl)
    # alternate serial and pipelined apply across the sweep — both paths
    # must match the sequential oracle on every workload shape
    depth = 4 if spec.seed % 2 == 0 else 1
    path = tempfile.mkdtemp(prefix=f"sweept{spec.seed}_") + "/pages"
    replay(spark, d, path, num_buckets=8, pipeline_depth=depth)
    t = PagesTable(spark, path)
    assert t.read().columns == cols
    assert_state_equal(t.read().collect(), oracle)


def test_skew_spreads_across_buckets(spark, event_log_dir, tmp_table_path):
    """Lineage-based skew evidence: zipf-hot urls still spread over buckets
    via xxhash64 (D2) — no bucket holds a pathological share."""
    replay(spark, event_log_dir, tmp_table_path, num_buckets=8)
    t = PagesTable(spark, tmp_table_path)
    rows = [v["rows"] for v in t.manifest().lineage.values()]
    assert len(rows) == 8
    assert max(rows) <= 3 * (sum(rows) / len(rows))

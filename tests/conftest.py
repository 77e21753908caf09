import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_syncer_spark.generator import GenSpec, generate_events, write_event_log
from mysql_syncer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def event_table():
    """Seeded 3k-event log (arrow table), shared across tests."""
    return generate_events(GenSpec(n_events=3_000))


@pytest.fixture(scope="session")
def event_log_dir(event_table):
    d = tempfile.mkdtemp(prefix="evlog_")
    write_event_log(event_table, d)
    return d


@pytest.fixture()
def tmp_table_path():
    return os.path.join(tempfile.mkdtemp(prefix="pages_"), "pages")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

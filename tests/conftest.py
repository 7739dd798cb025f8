import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Two-tier suite (r12 verdict #2): the multi-minute soaks / property
# sweeps outgrew the driver's pytest window (1025 tests / ~44 min ->
# truncated at ~70% and a permanently red tests_ok despite zero
# failures). Tests marked ``slow`` are skipped by default so the default
# ``pytest tests/`` run fits the window; the soak tier still runs with
# KICKHOUSE_RUN_SLOW=1 (same env-gate convention as the Kafka smoke).


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute soak/property sweep — skipped unless "
        "KICKHOUSE_RUN_SLOW=1 (the opt-in soak tier)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("KICKHOUSE_RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow tier: opt in with KICKHOUSE_RUN_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (  # noqa: E402
    get_spark,
)

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kickhouse-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE


@pytest.fixture()
def stream_tmpdir():
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="kickhouse-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def viewfs_root(spark, stream_tmpdir):
    """A viewfs:// mount over a tmpdir — genuine non-``file``-scheme Hadoop
    machinery (ViewFileSystem resolution) over local storage, shared by
    the manifest and sketch-maintenance suites. Yields
    (viewfs_uri, backing_local_dir)."""
    import uuid

    # unique mount-table name per test: Hadoop caches FileSystem
    # instances by (scheme, authority), so reusing one authority would
    # serve a stale mount table pointing at the previous test's tmpdir
    name = f"mfstest{uuid.uuid4().hex[:8]}"
    conf = spark._jsc.hadoopConfiguration()
    conf.set(f"fs.viewfs.mounttable.{name}.link./store", f"file://{stream_tmpdir}")
    yield f"viewfs://{name}/store", stream_tmpdir
    conf.unset(f"fs.viewfs.mounttable.{name}.link./store")

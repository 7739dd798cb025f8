import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Two-tier suite (r12 verdict #2): the multi-minute soaks / subprocess
# CLI drives / property sweeps outgrew the driver's pytest window
# (1025 tests / ~44 min -> truncated at ~70% and a permanently red
# tests_ok despite zero failures). Tests in the slow tier are skipped
# (visibly, as `s`) by default so the default ``pytest tests/`` run fits
# the window (~23 min measured); the soak tier still runs with
# KICKHOUSE_RUN_SLOW=1 (same env-gate convention as the Kafka smoke).
#
# The tier is a central nodeid list (measured >=10 s each in the r13
# full-run profile, /tmp not committed — every entry is a crash soak, a
# spark-submit subprocess drive, or a randomized property sweep; oracle
# correctness tests and operator-semantics tests stay in the default
# tier regardless of cost). A test may also opt in with
# @pytest.mark.slow.

_SLOW_TIER = {
    # end-to-end pipeline crash/restart soaks (module)
    "test_pipeline_soak.py": None,  # whole module
    # spark-submit subprocess CLI drives
    "test_ivf_index.py::test_ann_index_cli_append_mode": True,
    "test_ivf_index.py::test_index_health_cli": True,
    "test_dedup_index.py::test_ingest_gate_cli_both_modes": True,
    "test_dedup_index.py::test_ingest_gate_cli_pipeline_mode": True,
    "test_dedup_index.py::test_ingest_gate_cli_quality_gate": True,
    "test_dedup_index.py::test_ingest_gate_cli_reconcile": True,
    "test_dedup_index.py::test_job_build_then_classify": True,
    "test_dedup_index.py::test_job_clusters_mode": True,
    "test_dedup_index.py::test_compact_dedup_index_preserves_content": True,
    "test_parts_table.py::test_parts_table_cli_optimize_partitions": True,
    "test_parts_table.py::test_parts_table_cli_mutate": True,
    "test_parts_table.py::test_parts_table_cli_new_engine_flags": True,
    "test_forget.py::test_forget_cli": True,
    "test_forget.py::test_dedup_forget_unblocks_vacuum_and_reaccept": True,
    "test_forget.py::test_ivf_and_ivfpq_forget": True,
    "test_forget.py::test_bm25_forget_equals_fresh_build": True,
    "test_forget.py::test_dedup_forget_near_dup_unblocks": True,
    "test_phash_index.py::test_phash_gate_cli": True,
    "test_curate_job.py::test_curate_with_quality_gate_and_span_rewrite": True,
    "test_curate_job.py::test_curate_with_benchmark_decontamination": True,
    "test_scd2_stream.py::test_each_prefix_is_a_correct_dimension": True,
    "test_scd2_stream.py::test_retry_of_last_batch_is_noop": True,
    # randomized / exhaustive property sweeps with independent references
    "test_range_join.py::test_matches_naive_reference": True,
    "test_property_parts.py::test_collapsing_any_split_any_prefix_merge_is_one_shot": True,
    "test_property_parts.py::test_aggregating_any_batch_split_equals_group_by": True,
    "test_asof.py::test_bucketed_equals_plain_property": True,
    "test_bm25.py::test_bm25_matches_python_reference_on_random_corpora": True,
    "test_operators.py::test_dictionary_property_matches_reference_semantics": True,
    "test_semdedup_stream.py::test_reconcile_converges_batch_orderings": True,
    "test_multiplex.py::test_multiplexed_streaming_runs": True,
    "test_highdim.py::test_kmeans_dim1536_runs_and_is_deterministic": True,
    "test_phash_index.py::test_phash_gate_matches_reference": True,
    "test_phash_index.py::test_absorb_equals_build_over_union": True,
    "test_maintenance_layout.py::test_compaction_shrinks_files_preserves_rows": True,
    "test_maintenance_layout.py::test_compaction_splits_oversized_partition": True,
}


def _in_slow_tier(item) -> bool:
    rel = item.nodeid.split("/")[-1]  # tests/foo.py::test -> foo.py::test
    mod = rel.split("::", 1)[0]
    if _SLOW_TIER.get(mod, True) is None:
        return True
    # strip parametrization for list matching
    base = rel.split("[", 1)[0]
    return base in _SLOW_TIER


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute soak/CLI-drive/property sweep — skipped unless "
        "KICKHOUSE_RUN_SLOW=1 (the opt-in soak tier)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("KICKHOUSE_RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow tier: opt in with KICKHOUSE_RUN_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords or _in_slow_tier(item):
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

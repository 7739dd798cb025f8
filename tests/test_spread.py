"""spread_for_cpu gate: re-spread only inside the profit window.

Below ``min_bytes`` the single-core narrow stage is already sub-second
and the re-spread shuffle + per-stage task overhead is a net loss
(measured +1 s on the minhash query at sf0.1 in round 5); above
``max_bytes`` the input is corpus-scale and its scan fans out by itself.
"""

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.operators.spread import (
    spread_for_cpu,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.tables import (
    load_table,
)


def _partitions(df):
    return df.rdd.getNumPartitions()


def test_tiny_input_not_spread(spark, sf_small):
    """A sub-MB pruned scan passes through untouched (no repartition
    node, same partition count)."""
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    out = spread_for_cpu(docs)
    assert out is docs  # identity: the gate fails closed to a no-op


def test_window_input_spread(spark, sf_small):
    """An input inside [min, max] with an under-parallel scan is
    round-robin repartitioned to defaultParallelism."""
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    assert _partitions(docs) == 1
    out = spread_for_cpu(docs, min_bytes=1)  # force-open the lower gate
    assert _partitions(out) == spark.sparkContext.defaultParallelism


def test_large_input_not_spread(spark, sf_small):
    """Above max_bytes the input passes through (corpus-scale scans fan
    out on their own; re-shuffling raw text would be the bottleneck)."""
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    out = spread_for_cpu(docs, max_bytes=1, min_bytes=0)
    assert _partitions(out) == _partitions(docs)

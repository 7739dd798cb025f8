"""CPU-spreading for broadcast-small inputs ahead of expensive narrow stages.

Parquet scan parallelism is bounded by row groups, not by data volume: a
small table written as one file/one row group arrives as ONE input split,
and every narrow stage chained onto the scan (regex shingling, from_json,
sha2 hashing) then runs serially on one core while the rest of the
executor idles. Spark has no adaptive mechanism for this — AQE re-sizes
*shuffle* partitions, never scan splits.

``spread_for_cpu`` is the deliberate, size-gated answer: when the
optimizer's size estimate says the input is broadcast-small (default
≤64 MB — the same order as the session's broadcast-join threshold) AND the
scan has fewer partitions than ``defaultParallelism``, round-robin
repartition it across cores. The shuffle moves at most those few MB once;
the CPU-bound stage that follows gets cores× throughput. Corpus-scale
inputs pass through untouched: their scans already fan out, and
repartitioning raw text/JSON at 100 TB would be the bottleneck, not the
fix.

Used by the dedup family's shingle scan (operators/dedup.shingle_rows)
and the validator's parse-and-hash chain (plans/validator.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: inputs at or below this estimated size are eligible — the re-spread
#: shuffle then moves at most this many bytes (broadcast-scale, never
#: corpus-scale)
SPREAD_MAX_BYTES = 64 * 1024 * 1024

#: inputs BELOW this estimated size are left alone: on sub-MB inputs the
#: single-core narrow stage is already sub-second, while the re-spread
#: costs a shuffle round-trip plus cores× task scheduling on every
#: downstream stage that reads the (now 32-partition) output — measured
#: as a net +1 s on the minhash query at sf0.1 when its 255 KB pruned
#: document scan was spread (round-5 bench regression; the 2 MB
#: validator parse chain, by contrast, keeps its win). The profit window
#: is [min, max]: big enough that serial CPU time dominates, small
#: enough that the shuffle is broadcast-scale.
SPREAD_MIN_BYTES = 1024 * 1024


def spread_for_cpu(
    df: DataFrame,
    max_bytes: int = SPREAD_MAX_BYTES,
    min_bytes: int = SPREAD_MIN_BYTES,
) -> DataFrame:
    """Re-spread a broadcast-small, under-partitioned input across cores
    (see module docstring). Returns ``df`` unchanged when the input is
    large, tiny (below ``min_bytes`` — see above), already parallel, or
    when plan statistics are unavailable (e.g. Spark Connect) — the gate
    fails closed to a no-op."""
    try:
        spark = df.sparkSession
        par = spark.sparkContext.defaultParallelism
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if min_bytes <= size <= max_bytes and df.rdd.getNumPartitions() < par:
            return df.repartition(par)
    except Exception:
        pass
    return df

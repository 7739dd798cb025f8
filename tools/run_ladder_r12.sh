#!/bin/bash
# Round-12 4-point scaling ladder runner: the r10/r11 ladder legs +
# the r11 stat legs, repeats=3 medians, one matched same-day run per
# scale (r10 lesson: cross-day bench pairs are not comparable).
# Index-lifecycle legs (build_*/append_*/parts_*) ride along
# automatically in index_secs. sf100 gets a bigger driver heap: the
# single local-mode JVM carries what a cluster would spread.
set -e
cd /root/repo
LEGS="validator_route_counts knn_pq_rerank docs_ngram_jaccard_pairs \
docs_minhash_lsh_pairs docs_dup_clusters events_window_funnel \
events_sequence_count events_sequence_match events_retention \
moving_avg_error_pct user_sessions_30min orders_price_welch_ttest \
events_value_mannwhitney events_quantiles_exact lineitem_summap_qty \
events_topk_weighted_types"

run () {  # $1 = sf dir, $2 = tag, $3 = driver mem, $4 = shuffle parts, $5 = codec
  echo "=== ladder: $2 ($1) ===" >&2
  SPARK_GRAFT_SF_DIR="$1" SPARK_DRIVER_MEMORY="$3" \
    SPARK_SHUFFLE_PARTITIONS="${4:-32}" SPARK_IO_CODEC="${5:-lz4}" \
    python bench.py $LEGS --repeats=3 \
    > "/tmp/ladder_$2.out" 2> "/tmp/ladder_$2.err"
  # bench.py prints ONE JSON line, but at big heaps the JVM's gc,alloc
  # warnings leak onto stdout too (first sf100 run) — keep only the
  # final JSON object line.
  grep -a '^{' "/tmp/ladder_$2.out" | tail -n 1 > "benchruns/r12_ladder_$2.json"
  tail -c 200 "benchruns/r12_ladder_$2.json" >&2; echo >&2
}

run /root/testdata/sf0.1      sf0.1  8g
run .benchdata/sf1            sf1    16g
run .benchdata/sf10           sf10   48g
# sf100: shuffle partitions scale with the data (the production posture —
# a fixed 32 meant GB-scale shuffle blocks and 32 concurrent 1 GB+ sort
# buffers, which OOM'd a 72 g driver heap on the second r12 attempt; AQE
# coalesces the small shuffles back down, so only oversized partitions
# change). 256 ≈ the 128 MB-per-partition target at this fixture's
# biggest shuffles. zstd shuffle compression because local DISK binds at
# this scale (~50 GB live shuffle working set on the heaviest dedup leg
# vs ~60 GB scratch): 30-40% smaller shuffle files for ~10-20% codec CPU.
run .benchdata/sf100          sf100  72g 256 zstd
echo "ladder complete" >&2

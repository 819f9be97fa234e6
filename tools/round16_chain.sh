#!/bin/bash
# r16 round-close artifact chain — ONE run context for every committed
# number (the r15 verdict #1 ask: no out-of-chain singles merged in).
# Runs serially on an idle box; each stage logs to /tmp/r16_chain.
set -x
cd /root/repo
OUT=/tmp/r16_chain
mkdir -p $OUT

# 0. freeze compiled classes so nothing races a stray compile
sbt -batch "Test/compile" > $OUT/00_compile.log 2>&1 || exit 1

# 1. sf0.01 full-surface Verify + DuckDB oracle (the driver's gate, previewed)
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r16_full" \
  > $OUT/01_verify_sf001.log 2>&1
python3 tools/oracle_check.py /tmp/verify_r16_full /root/testdata/sf0.01 \
  $OUT/check_sf001.json 600 > $OUT/01_oracle.log 2>&1

# 2. graded bench, sf0.1, median-of-3 -> bench_full.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  sbt -batch "runMain graft.Bench" > $OUT/02_bench_sf01.log 2>&1

# 3. graded bench, sf1, median-of-3 -> BENCH_sf1.json
SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  sbt -batch "runMain graft.Bench" > $OUT/03_bench_sf1.log 2>&1

# 4. full-surface scaling ratios -> SCALING_r16.json
python3 tools/scaling_ratio.py BENCH_sf1.json bench_full.json SCALING_r16.json \
  > $OUT/04_scaling.log 2>&1

# 5. materialized-mode audit, sf0.1, single run -> bench_materialized.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_EVAL=materialize SPARK_GRAFT_RUNS=1 \
  sbt -batch "runMain graft.Bench" > $OUT/05_materialized.log 2>&1

# 6. sf1 full-surface correctness -> CORRECTNESS_sf1.json
SPARK_GRAFT_CPUS=24 SPARK_DRIVER_MEM=96g \
  sbt -batch "runMain graft.Verify /root/repo/testdata-sf1 /tmp/verify_r16_sf1" \
  > $OUT/06_verify_sf1.log 2>&1
python3 tools/oracle_check.py /tmp/verify_r16_sf1 /root/repo/testdata-sf1 \
  CORRECTNESS_sf1.json 1800 > $OUT/06_oracle_sf1.log 2>&1

# 7. sf10 second-decade rung over the heavy head + every r15/r16 addition
SF10_SET=cluster_keep_best,cluster_sizes,containment_join,dedup_incremental,doremi_mixture,dup_windows,host_cap_ranked,html_extract,lsh_recall,minhash_estimate,ngram_novelty,pq_codes,quantile_sketch,sb_doc_score,sb_ngram_counts,simhash_recall,snm_dedup,training_set,weighted_median,temperature_allocation,cluster_from_index,diversity_sample,csv_quarantine,ann_ivf,index_compaction,time_travel,ccnet_buckets,soft_dedup
# RUNS=2, not 1 (r16): with one sample a memoized-fixture entry
# (index_compaction, csv_quarantine, cluster_from_index, time_travel)
# pays its cold session bootstrap against the sf1 side's warm median —
# a storage-build cost, not a query shape — and a single host-noise
# burst has no second sample to reject it. min-of-2 measures the warm
# query both times (scaling_ratio.py uses spread.min per side).
SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=110g \
  SPARK_GRAFT_RUNS=2 SPARK_GRAFT_ONLY=$SF10_SET SPARK_GRAFT_BENCH_OUT=BENCH_sf10.json \
  sbt -batch "runMain graft.Bench" > $OUT/07_bench_sf10.log 2>&1
python3 tools/scaling_ratio.py BENCH_sf10.json BENCH_sf1.json SCALING_sf10.json \
  > $OUT/07_scaling_sf10.log 2>&1

echo CHAIN_DONE

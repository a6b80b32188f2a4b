#!/usr/bin/env bash
# Generate the class-data-sharing archives that amortize fresh-JVM cold
# start (the ~270 cpu-s of class-load + JIT churn every cold bench/verify
# JVM pays — bench_detail.json cold_jit_s, cold_attrib.json). Two
# archives, one per launcher (CDS validates the exact classpath):
#   target/graft-cds.jsa        — sbt-forked runs (the driver's
#                                 `sbt -batch "runMain graft.Bench"`)
#   target/graft-cds-direct.jsa — scripts/run_main.sh runs
# The training workload is a small representative Bench subset at
# sf0.001: it loads the Spark session, parquet scan/write, catalyst,
# codegen and streaming classes — the class mass a cold run pays.
# Re-run after a recompile for full effect; a stale archive is silently
# ignored (-Xshare:auto), never a failure.
set -euo pipefail
cd "$(dirname "$0")/.."

TRAIN_SET="agg_by_nation,join_orders_customers,read_all_forward,dedup_exact,sim_topk_brute,text_quality,proj_count_by_stream,corpus_mix,agg_hll_distinct,twinstore_resolve"

# a packaged jar is the app classpath for BOTH launchers (exportJars in
# build.sbt; run_main.sh prefers the jar when fresh) — the dynamic dump
# rejects non-empty classpath directories
echo "[gen_cds] packaging..."
sbt -batch package >/dev/null 2>&1

echo "[gen_cds] training sbt-fork archive (target/graft-cds.jsa)..."
rm -f target/graft-cds.jsa
SPARK_GRAFT_CDS_DUMP=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_ONLY="$TRAIN_SET" \
  sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || true
ls -la target/graft-cds.jsa 2>/dev/null || echo "[gen_cds] sbt archive NOT produced"

echo "[gen_cds] training direct-launch archive (target/graft-cds-direct.jsa)..."
rm -f target/graft-cds-direct.jsa
SPARK_GRAFT_CDS_DUMP=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_ONLY="$TRAIN_SET" \
  scripts/run_main.sh graft.Bench >/dev/null 2>&1 || true
ls -la target/graft-cds-direct.jsa 2>/dev/null || echo "[gen_cds] direct archive NOT produced"

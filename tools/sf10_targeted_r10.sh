#!/bin/bash
# Round-10 targeted sf10 gate: re-verdict every query whose engine path
# changed this round (x5 kernel, d10 fixpoint, mv1 refresh) plus the new
# pr4 and the three round-9 late additions whose sf10 evidence rows were
# prose-only (mv1/cdc1/sn3). Engine dump via SPARK_GRAFT_VERIFY_ONLY,
# oracle via tools/check_sf1.py (the committed SQL verbatim).
set -euo pipefail
cd /root/repo
Q="x5_normalized_fp,d10_dup_components,mv1_incremental_rollup,cdc1_snapshot_diff,sn3_point_lookup,pr4_frequent_values"
OUT=target/verify_sf10_r10
rm -rf "$OUT"; mkdir -p "$OUT"
SPARK_GRAFT_VERIFY_ONLY="$Q" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
  tools/run_class.sh graft.Verify target/sf10 "$OUT" \
  > target/verify_sf10_r10_engine.log 2>&1
echo "[sf10-r10] engine dump done; errors:"
cat "$OUT/verify_errors.json" 2>/dev/null || echo "(no errors file)"
DUCKDB_THREADS=${DUCKDB_THREADS:-16} DUCKDB_MEMORY=${DUCKDB_MEMORY:-48GB} \
  python3 tools/check_sf1.py target/sf10 "$OUT" 2>&1 \
  | tee target/check_sf10_r10.log

#!/usr/bin/env bash
# Round-5 chip chain: runs the queued convergence + horizon workloads
# back-to-back on the one tunnel chip, logging each stage.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs/r5
for S in r5_llff r5_other_formats r5_100k r5_100k_parity; do
  echo "######## START $S $(date -u +%H:%M:%S)"
  bash scripts/$S.sh > logs/r5/${S}.log 2>&1
  echo "######## END $S rc=$? $(date -u +%H:%M:%S)"
done

#!/bin/bash
# Full-surface factor-100 oracle gate at the DEFAULT heap (r14 verdict
# task #2): SPARK_DRIVER_MEM deliberately UNSET — the point of the run is
# proving the serialized-checkpoint + in-run memo-release work closed the
# f100 OOM class end-to-end on the stock 8g heap, not per-query.
# Phase 1: graft.Verify over the factor-100 replicated corpus.
# Phase 2: tools/check_timed.py DuckDB replay + exact compare (same
# 900s watchdog as the r13 gate). Chained so the multi-hour pair runs
# unattended; both phases log wall-clock boundaries for the notes.
set -u -o pipefail
SFDIR=${1:-/tmp/graft_sf10r}
OUTDIR=${2:-/tmp/graft_verify_sf10_r15}
ARTIFACT=${3:-/root/repo/CORRECTNESS_sf10_r15.json}
cd /root/repo
unset SPARK_DRIVER_MEM
echo "=== phase1 verify start $(date -u +%H:%M:%S) heap=default"
SPARK_GRAFT_GATE_FACTOR=100 sbt -batch "runMain graft.Verify $SFDIR $OUTDIR" \
  2>&1 | tail -20
rc=$?
echo "=== phase1 verify end $(date -u +%H:%M:%S) rc=$rc"
if [ $rc -ne 0 ]; then echo "verify failed; not starting check"; exit $rc; fi
echo "=== phase2 check start $(date -u +%H:%M:%S)"
python3 tools/check_timed.py "$SFDIR" "$OUTDIR" "$ARTIFACT" 900
rc=$?
echo "=== phase2 check end $(date -u +%H:%M:%S) rc=$rc"
exit $rc

#!/bin/bash
# Full-surface factor-100 oracle gate at the DEFAULT heap (r14 verdict
# task #2; r15 proved it green end-to-end): SPARK_DRIVER_MEM deliberately
# UNSET — the point of the run is proving the serialized-checkpoint +
# in-run memo-release work keeps the f100 OOM class closed on the stock
# 8g heap, not per-query.
# Phase 1: graft.Verify over the factor-100 replicated corpus.
# Phase 2: tools/check_timed.py DuckDB replay + exact compare (same
# 900s watchdog as the r13 gate). Chained so the multi-hour pair runs
# unattended; both phases log wall-clock boundaries for the notes.
#
# The artifact name is round-stamped (r15 verdict #4): set GRAFT_ROUND
# (e.g. GRAFT_ROUND=r16) or pass an explicit artifact path as $3 — with
# neither, the script REFUSES rather than silently overwrite a prior
# round's committed CORRECTNESS_sf10_r{N}.json.
set -u -o pipefail
if [ -z "${GRAFT_ROUND:-}" ] && [ -z "${3:-}" ]; then
  echo "REFUSED: set GRAFT_ROUND=rNN (artifact -> CORRECTNESS_sf10_rNN.json)"
  echo "         or pass an explicit artifact path as the 3rd argument."
  exit 2
fi
# ADVICE r16: an explicit artifact ($3) without GRAFT_ROUND used to fall
# back to the SHARED /tmp/graft_verify_sf10_adhoc outdir — successive
# ad-hoc runs could replay a partially-overwritten Verify output against
# a mismatched oracle_sql.json. Require an explicit outdir ($2) too.
if [ -z "${GRAFT_ROUND:-}" ] && [ -n "${3:-}" ] && [ -z "${2:-}" ]; then
  echo "REFUSED: an explicit artifact path (\$3) without GRAFT_ROUND also"
  echo "         requires an explicit outdir (\$2) — the shared adhoc"
  echo "         outdir can replay stale Verify output across runs."
  exit 2
fi
SFDIR=${1:-/tmp/graft_sf10r}
OUTDIR=${2:-/tmp/graft_verify_sf10_${GRAFT_ROUND:-adhoc}}
ARTIFACT=${3:-/root/repo/CORRECTNESS_sf10_${GRAFT_ROUND}.json}
cd /root/repo
unset SPARK_DRIVER_MEM
echo "=== phase1 verify start $(date -u +%H:%M:%S) heap=default artifact=$ARTIFACT"
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

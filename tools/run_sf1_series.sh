#!/bin/bash
# Run the pre-registered round-5 sf1 attempt series (attempts 15-18,
# BENCH/BASELINE.md "Round-5 pre-registration") sequentially on an
# otherwise-idle host, committing BENCH/sf1_r3.json after each attempt
# so partial series survive a driver cutoff.
set -u
cd /root/repo
N_ATTEMPTS="${1:-4}"
CACHE=/tmp/msss_bench_cache
# Wait (max 30 min) for all three sf1 layouts to finish generating.
for i in $(seq 1 180); do
  ok=1
  for d in v4-10000000-8-250000-50000 v4-10000000-8-500000-50000 v4-10000000-8-10000000-50000; do
    [ -f "$CACHE/$d/_COMPLETE" ] || ok=0
  done
  [ "$ok" = 1 ] && break
  sleep 10
done
if [ "$ok" != 1 ]; then
  echo "FATAL: sf1 layouts not complete after 30 min" >&2
  exit 1
fi
echo "layouts ready at $(date -u +%H:%M:%S)"
for a in $(seq 1 "$N_ATTEMPTS"); do
  echo "=== attempt $a/$N_ATTEMPTS start $(date -u +%H:%M:%S) ==="
  python tools/sf1_attempt.py > "/tmp/sf1_series_attempt_$a.json" 2>"/tmp/sf1_series_attempt_$a.err"
  rc=$?
  echo "=== attempt $a rc=$rc end $(date -u +%H:%M:%S) ==="
  tail -c 400 "/tmp/sf1_series_attempt_$a.json"
  echo
  if [ $rc -eq 0 ]; then
    git add BENCH/sf1_r3.json
    git commit -q -m "sf1 scaling attempt $((14 + a))/18 of the pre-registered round-5 series

No-Verification-Needed: benchmark evidence JSON only, no source change"
  fi
done
echo "SERIES DONE $(date -u +%H:%M:%S)"

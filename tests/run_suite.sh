#!/bin/sh
# Sharded test-suite runner (VERDICT r4 weak #9 / task 2).
#
# Rationale: two independent judge-box runs of the full fast suite in ONE
# process died with a segfault inside XLA:CPU backend_compile_and_load at
# ~85% (hundreds of compilations on an 8-virtual-device CPU backend in one
# long-lived process), while every piece passes when started fresh.  This
# runner splits the suite across a few sequential pytest processes so no
# single process accumulates enough compiler state to hit the fragility;
# it is the documented robust invocation of the correctness gate.
#
# Usage: sh tests/run_suite.sh [N_SHARDS] [pytest -m expression]
#   sh tests/run_suite.sh              # 4 shards, fast suite (-m "not slow")
#   sh tests/run_suite.sh 4 ""         # 4 shards, FULL suite incl. slow
set -u
cd "$(dirname "$0")/.."

SHARDS="${1:-4}"
MARKER="${2-not slow}"

files=$(ls tests/test_*.py | sort)
total_fail=0
i=0
for f in $files; do
  eval "shard_$((i % SHARDS))=\"\${shard_$((i % SHARDS))-} $f\""
  i=$((i + 1))
done

k=0
while [ "$k" -lt "$SHARDS" ]; do
  eval "chunk=\${shard_$k-}"
  if [ -n "$chunk" ]; then
    echo "=== shard $((k + 1))/$SHARDS: $chunk"
    if [ -n "$MARKER" ]; then
      python -m pytest $chunk -q -m "$MARKER"
    else
      python -m pytest $chunk -q
    fi
    rc=$?
    # exit 5 = no tests collected in this shard (marker filtered) — fine.
    [ "$rc" -ne 0 ] && [ "$rc" -ne 5 ] && total_fail=$((total_fail + 1)) \
      && echo "=== shard $((k + 1)) FAILED (rc $rc)"
  fi
  k=$((k + 1))
done

if [ "$total_fail" -eq 0 ]; then
  echo "SUITE GREEN (all $SHARDS shards)"
else
  echo "SUITE FAILED: $total_fail shard(s) red"
  exit 1
fi

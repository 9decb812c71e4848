# Round-4 phase-2 TPU chain (run AFTER tools_chain_tpu_r4.sh prints
# R4_CHAIN_DONE):
#   1. fresh parity bench — captures the planar segment-sum change
#      (BENCH_LASTGOOD refresh + warm compile cache for the driver's
#      end-of-round bench)
#   2. bucket-3 continuation A/B (VERDICT r3 task 9): branch the 2000-step
#      factor-0.45 sphere state (compact_ab x1 snapshot) into bucket-2 and
#      bucket-3 geometries, +800 steps each, compare held-out quality
#   3. one LONG-window l4f8 bench attempt (its train step hits a v5e
#      compile pathology >23 min; 3300s gives the two compiles ~50 min)
set -u
cd /root/repo
LOG=/tmp/r4b_chain.log

timeout 1500 python bench.py >> "$LOG" 2>&1
echo "exit $? : bench parity (planar)" >> "$LOG"

run_chunks() {  # run_chunks <json-file> <target-steps> <max-chunks> <cmd...>
  JSONF=$1; TARGET=$2; MAX=$3; shift 3
  for i in $(seq 1 "$MAX"); do
    steps=$(python -c "import json,sys
try: print(json.load(open(sys.argv[1])).get('steps', 0))
except Exception: print(0)" "$JSONF")
    [ "$steps" -ge "$TARGET" ] && break
    env AB_BUDGET_S=600 BC_BASE=/tmp/compact_ab_x1_sphere.msgpack \
      timeout 1250 "$@" >> "$LOG" 2>&1
    echo "exit $? chunk $i of: $*" >> "$LOG"
    sleep 2
  done
}

run_chunks /tmp/bucket_cont_b2.json 2800 5 python -u tools_bucket_cont.py 2 800
run_chunks /tmp/bucket_cont_b3.json 2800 5 python -u tools_bucket_cont.py 3 800
echo "BUCKET3_AB done: b2=$(cat /tmp/bucket_cont_b2.json 2>/dev/null) b3=$(cat /tmp/bucket_cont_b3.json 2>/dev/null)" >> "$LOG"

timeout 3300 python bench.py --config l4f8 >> "$LOG" 2>&1
echo "exit $? : bench l4f8 (long window)" >> "$LOG"
echo R4B_CHAIN_DONE >> "$LOG"

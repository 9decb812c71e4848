# Round-4 TPU chain (run AFTER tools_chain_csg_tpu.sh prints
# CSG_TPU_CHAIN_DONE — one tunnel client at a time):
#   1. full parity bench (captures BENCH_LASTGOOD.json + the >=1.0x record)
#   2. render-path bench (pixels/s — VERDICT r3 missing #4)
#   3. tpu_opt config bench (per-config step time — VERDICT weak #4)
#   4. hit-ray compaction A/B on the bench scene (x1 vs x2, 2000 steps each,
#      equal steps + recorded ms/step — VERDICT r3 task 3)
#   5. adaptive_samples_factor A/B on the HARD scene (0.45 vs 0.75 at 2000
#      steps, csg — VERDICT weak #2)
set -u
cd /root/repo
LOG=/tmp/r4_chain.log

run_chunks() {  # run_chunks <json-file> <target-steps> <max-chunks> <cmd...>
  JSONF=$1; TARGET=$2; MAX=$3; shift 3
  for i in $(seq 1 "$MAX"); do
    steps=$(python -c "import json,sys
try: print(json.load(open(sys.argv[1])).get('steps', 0))
except Exception: print(0)" "$JSONF")
    [ "$steps" -ge "$TARGET" ] && break
    env AB_BUDGET_S=700 timeout 1100 "$@" >> "$LOG" 2>&1
    echo "exit $? chunk $i of: $*" >> "$LOG"
    sleep 2
  done
}

timeout 1500 python bench.py >> "$LOG" 2>&1
echo "exit $? : bench parity" >> "$LOG"

# Backward segment-sum formatting probe (VERDICT r3 task 4: is the f32->bf16
# convert around the sorts worth deleting?) + a fresh bucket-2 profile.
timeout 900 python -u tools_probe_segsum.py >> "$LOG" 2>&1
echo "exit $? : probe segsum" >> "$LOG"
timeout 1200 python -u tools_profile_step.py 2 3 >> "$LOG" 2>&1
echo "exit $? : profile bucket-2" >> "$LOG"

timeout 1500 python bench.py --render >> "$LOG" 2>&1
echo "exit $? : bench render" >> "$LOG"

timeout 1200 python bench.py --config tpu_opt >> "$LOG" 2>&1
echo "exit $? : bench tpu_opt" >> "$LOG"

run_chunks /tmp/compact_ab_x1_sphere.json 2000 6 \
  python -u tools_compact_ab.py 1 2000
run_chunks /tmp/compact_ab_x2_sphere.json 2000 6 \
  python -u tools_compact_ab.py 2 2000
echo "COMPACT_AB done: $(cat /tmp/compact_ab_x1_sphere.json 2>/dev/null) | $(cat /tmp/compact_ab_x2_sphere.json 2>/dev/null)" >> "$LOG"

run_chunks /tmp/bucket_ab_f0p45_csg.json 2000 6 \
  env BAB_SCENE=csg python -u tools_bucket_ab.py 0.45 2000
run_chunks /tmp/bucket_ab_f0p75_csg.json 2000 6 \
  env BAB_SCENE=csg python -u tools_bucket_ab.py 0.75 2000
echo "CSG_FACTOR_AB done: $(cat /tmp/bucket_ab_f0p45_csg.json 2>/dev/null) | $(cat /tmp/bucket_ab_f0p75_csg.json 2>/dev/null)" >> "$LOG"

echo R4_CHAIN_DONE >> "$LOG"

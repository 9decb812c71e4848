# 15k flagship chain, round-4 geometry: post-resume overheads grew (bucket
# re-vote recompile on first post-change chunks; 222 MB snapshot fetch), and
# a 700s-budget chunk under `timeout 1100` lost its save once (chain log
# chunk 2, exit 124: 1300 steps lost).  Budget 520s + timeout 1250 leaves
# ~450s of save headroom.  Then the l4f8 bench, then the r4 chain.
set -u
cd /root/repo
LOG=/tmp/csg_tpu_chain.log

json_steps() {
  python -c "import json,sys
try: print(json.load(open(sys.argv[1]))['steps'])
except Exception: print(0)" "$1"
}

TARGET=15000
JSONF=/tmp/tpu_validate_csg_48v_256.json
for i in $(seq 1 24); do
  [ "$(json_steps "$JSONF")" -ge "$TARGET" ] && break
  env CSG_VIEWS=48 CSG_ERROR_MAP=1 CSG_BUDGET_S=520 timeout 1250 \
    python -u tools_tpu_validate_csg.py "$TARGET" >> "$LOG" 2>&1
  echo "exit $? chunk-b $i" >> "$LOG"
  sleep 2
done
echo "FLAGSHIP15K done: $(cat "$JSONF" 2>/dev/null)" >> "$LOG"

timeout 1500 python bench.py --config l4f8 >> "$LOG" 2>&1
echo "exit $? : bench l4f8" >> "$LOG"
echo CSG_TPU_CHAIN_DONE >> "$LOG"

sh tools_chain_tpu_r4.sh

# Round-3 TPU quality chain (run AFTER tools_chain_tpu_r3.sh finishes —
# one tunnel client at a time):
#   flagship lane: 48-view CSG protocol to 15000 steps (the reference's own
#   DTU step count, BASELINE config-2 analog) on the real chip, resumable
#   in tunnel-window chunks;
#   then the l4f8 variant step-time bench (VERDICT task 4's last number).
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
# Chunk geometry: ~130 s startup (snapshot load + cached-compile checks) +
# CSG_BUDGET_S of training + ~120 s snapshot save/fetch over the tunnel.
# The timeout must cover all three or the save is killed and the chunk's
# training is lost (observed: 580 s chunks never persisted).
for i in $(seq 1 20); do
  [ "$(json_steps "$JSONF")" -ge "$TARGET" ] && break
  env CSG_VIEWS=48 CSG_ERROR_MAP=1 CSG_BUDGET_S=700 timeout 1100 \
    python -u tools_tpu_validate_csg.py "$TARGET" >> "$LOG" 2>&1
  echo "exit $? chunk $i" >> "$LOG"
  sleep 2
done
echo "FLAGSHIP15K done: $(cat "$JSONF" 2>/dev/null)" >> "$LOG"

timeout 1200 python bench.py --config l4f8 >> "$LOG" 2>&1
echo "exit $? : bench l4f8" >> "$LOG"
echo CSG_TPU_CHAIN_DONE >> "$LOG"

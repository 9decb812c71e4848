# Chained CPU quality-run queue (round 2, 08-18): waits for the in-flight
# L4F8 48-view CSG run, then runs the multi-scene sweep (dumbbell, bowl) and
# finally extends the flagship 48-view CSG run to the reference's DTU step
# count (15k; BASELINE config 2).  Every run is snapshot-resumable in
# CSG_BUDGET_S chunks; completion is detected from the "steps" field of the
# per-run JSON (the flagship json already exists at 8000 steps, so a bare
# file-existence check would misfire).
set -u
cd /root/repo

json_steps() {  # json_steps FILE -> prints steps field or 0
  python -c "import json,sys
try: print(json.load(open(sys.argv[1]))['steps'])
except Exception: print(0)" "$1"
}

# 1. wait for the l4f8 run (launched earlier) to finish, max 3h
for i in $(seq 1 180); do
  [ -f /tmp/tpu_validate_csg_48v_256_l4f8.json ] && break
  sleep 60
done

# 2. multi-scene sweep at the full 48-view protocol
for scene in dumbbell bowl; do
  for i in $(seq 1 8); do
    [ "$(json_steps /tmp/tpu_validate_csg_48v_256_${scene}.json)" -ge 4000 ] && break
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu CSG_VIEWS=48 CSG_ERROR_MAP=1 \
      CSG_SCENE=$scene CSG_BUDGET_S=3300 nice -n 5 timeout 4200 \
      python -u tools_tpu_validate_csg.py 4000 \
      >> /tmp/csg48_${scene}_cpu.log 2>&1
    sleep 2
  done
done

# 3. flagship 15k-step extension (archive the 8000-step json first)
cp -n /tmp/tpu_validate_csg_48v_256.json /tmp/tpu_validate_csg_48v_256_8000.json || true
for i in $(seq 1 12); do
  [ "$(json_steps /tmp/tpu_validate_csg_48v_256.json)" -ge 15000 ] && break
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu CSG_VIEWS=48 CSG_ERROR_MAP=1 \
    CSG_BUDGET_S=3300 nice -n 5 timeout 4200 \
    python -u tools_tpu_validate_csg.py 15000 \
    >> /tmp/csg48_15k_cpu.log 2>&1
  sleep 2
done

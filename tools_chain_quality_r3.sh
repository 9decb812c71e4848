# Round-3 CPU quality-run queue (VERDICT.md task 4).  /tmp was wiped between
# rounds, so every run starts fresh; each is snapshot-resumable in
# CSG_BUDGET_S chunks and loops until its per-run JSON reports the target
# step count.  Two lanes are launched by the session (this script is one
# lane; pass the lane name):
#   scenes   — dumbbell 4k, then bowl 4k   (BASELINE config-3 analog)
#   flagship — 48-view flagship to 15k     (BASELINE config-2 analog)
set -u
cd /root/repo
LANE="${1:?lane: scenes|flagship}"

json_steps() {
  python -c "import json,sys
try: print(json.load(open(sys.argv[1]))['steps'])
except Exception: print(0)" "$1"
}

run_until() {  # run_until TARGET JSONFILE LOG [extra env...]
  local target=$1 jsonf=$2 log=$3; shift 3
  for i in $(seq 1 40); do
    [ "$(json_steps "$jsonf")" -ge "$target" ] && return 0
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu CSG_VIEWS=48 CSG_ERROR_MAP=1 \
      CSG_BUDGET_S=3300 "$@" nice -n 10 timeout 4200 \
      python -u tools_tpu_validate_csg.py "$target" >> "$log" 2>&1
    sleep 2
  done
}

case "$LANE" in
  scenes)
    run_until 4000 /tmp/tpu_validate_csg_48v_256_dumbbell.json \
      /tmp/csg48_dumbbell_cpu.log CSG_SCENE=dumbbell
    run_until 4000 /tmp/tpu_validate_csg_48v_256_bowl.json \
      /tmp/csg48_bowl_cpu.log CSG_SCENE=bowl
    ;;
  flagship)
    run_until 15000 /tmp/tpu_validate_csg_48v_256.json /tmp/csg48_15k_cpu.log
    ;;
esac
echo "LANE $LANE DONE" >> /tmp/chain_r3.log

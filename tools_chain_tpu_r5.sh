# Round-5 TPU chain (one tunnel client at a time; start with
#   nohup sh tools_chain_tpu_r5.sh > /tmp/r5_chain_nohup.log 2>&1 &
# ).  Phases, in value order (VERDICT r4 tasks 1a, 3, 4, 6 + re-records):
#   A. l4f8 48-view CSG quality protocol, 4k steps (chip quality evidence
#      for the fastest config, task 1a) — new hit_oversample=2 default.
#   B. compaction SSIM A/B seed replicates (seeds 1, 2 x arms x1, x2) to
#      settle noise-vs-systematic (task 3).
#   C. at-scale data path: 48 views @1024^2 fp16 texels, 4k steps (task 4).
#   D. dynamic protocol at static scale: 48 views @256^2 flagship (task 6).
#   E. bench re-records (parity + l4f8) under the new defaults.
# Chunk geometry per CLAUDE.md rule 7/8: timeout must cover startup +
# budget + snapshot save; first chunk of each phase also covers a fresh
# compile (the oversample default flip invalidated every cached program).
set -u
cd /root/repo
LOG=/tmp/r5_chain.log
echo "=== r5 chain start $(date -u +%H:%M:%S)" >> "$LOG"

json_steps() {
  python -c "import json,sys
try: print(json.load(open(sys.argv[1]))['steps'])
except Exception: print(0)" "$1"
}

# --- A: l4f8 quality, 4k steps ---------------------------------------------
# CSG_BF16: the fp32 l4f8 48-view program crashes the v5e worker at run
# time (round-5 bisect: compaction/emap exonerated, parity-fp32 and
# l4f8-bf16 fine) — l4f8 ships at the bench/product bf16 precision.
JSONF=/tmp/tpu_validate_csg_48v_256_l4f8.json
for i in $(seq 1 8); do
  [ "$(json_steps "$JSONF")" -ge 4000 ] && break
  env CSG_VIEWS=48 CSG_ERROR_MAP=1 CSG_CONFIG=l4f8 CSG_BF16=1 CSG_BUDGET_S=700 \
    timeout 2500 python -u tools_tpu_validate_csg.py 4000 >> "$LOG" 2>&1
  echo "exit $? : A chunk $i" >> "$LOG"
  sleep 2
done
echo "A done: $(cat "$JSONF" 2>/dev/null)" >> "$LOG"

# --- B: compaction A/B seeds (quality + wall time per arm) ------------------
for seed in 1 2; do
  for os in 1 2; do
    META=/tmp/compact_ab_x${os}_sphere_s${seed}.json
    for i in $(seq 1 6); do
      python -c "import json;d=json.load(open('$META'));exit(0 if 'held_out_psnr' in d else 1)" 2>/dev/null && break
      env CAB_SEED=$seed AB_BUDGET_S=700 timeout 2500 \
        python -u tools_compact_ab.py $os 2000 >> "$LOG" 2>&1
      echo "exit $? : B x${os} s${seed} chunk $i" >> "$LOG"
      sleep 2
    done
    echo "B x${os} s${seed} done: $(cat "$META" 2>/dev/null | tail -c 400)" >> "$LOG"
  done
done

# --- C: at-scale 1024^2 fp16, 4k steps --------------------------------------
JSONF=/tmp/tpu_validate_csg_48v_1024.json
for i in $(seq 1 10); do
  [ "$(json_steps "$JSONF")" -ge 4000 ] && break
  env CSG_VIEWS=48 CSG_RES=1024 CSG_ERROR_MAP=1 CSG_FP16=1 CSG_BUDGET_S=700 \
    timeout 2500 python -u tools_tpu_validate_csg.py 4000 >> "$LOG" 2>&1
  echo "exit $? : C chunk $i" >> "$LOG"
  sleep 2
done
echo "C done: $(cat "$JSONF" 2>/dev/null)" >> "$LOG"

# --- D: dynamic protocol at static scale ------------------------------------
OUTD=/tmp/dynamic_quality_r5full.json
for i in $(seq 1 10); do
  [ -f "$OUTD" ] && break
  env DYN_FULL=1 DYN_VIEWS=48 DYN_RES=256 DYN_FRAME0_STEPS=1000 \
      DYN_REFINE_STEPS=250 DYN_NEXT_STEPS=450 DYN_DELTA_LR=1e-2 \
      DYN_TAG=r5full DYN_BUDGET_S=700 \
    timeout 2500 python -u tools_dynamic_quality.py >> "$LOG" 2>&1
  echo "exit $? : D chunk $i" >> "$LOG"
  sleep 2
done
echo "D done: $(cat "$OUTD" 2>/dev/null)" >> "$LOG"

# --- E: bench re-records -----------------------------------------------------
timeout 2500 python -u bench.py --config l4f8 >> "$LOG" 2>&1
echo "exit $? : bench l4f8" >> "$LOG"
timeout 1500 python -u bench.py >> "$LOG" 2>&1
echo "exit $? : bench parity refresh" >> "$LOG"
echo R5_CHAIN_DONE >> "$LOG"

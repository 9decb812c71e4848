# Fixed full-scale dynamic rerun (after the refine-phase compaction fix):
# launch AFTER tools_chain_tpu_r5.sh prints R5_CHAIN_DONE (one tunnel
# client at a time).  Frames report incrementally to
# /tmp/dynamic_quality_r5fixed_partial.json, so even a window-truncated
# run leaves per-frame evidence.
set -u
cd /root/repo
LOG=/tmp/r5_dynfixed.log
OUTD=/tmp/dynamic_quality_r5fixed.json
for i in $(seq 1 8); do
  [ -f "$OUTD" ] && break
  env DYN_FULL=1 DYN_VIEWS=48 DYN_RES=256 DYN_FRAME0_STEPS=1000 \
      DYN_REFINE_STEPS=250 DYN_NEXT_STEPS=450 DYN_DELTA_LR=1e-2 \
      DYN_TAG=r5fixed DYN_BUDGET_S=700 \
    timeout 2500 python -u tools_dynamic_quality.py >> "$LOG" 2>&1
  echo "exit $? : dynfixed chunk $i" >> "$LOG"
  sleep 2
done
echo "DYNFIXED done: $(cat "$OUTD" 2>/dev/null)" >> "$LOG"

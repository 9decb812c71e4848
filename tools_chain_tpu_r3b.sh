# Round-3 TPU chain, part B (launch alongside part A — polls until part A
# prints TPU_CHAIN_DONE):
#   1. bucket-geometry continuation A/B (tools_bucket_cont.py 0/1/2);
#   2. march stage probes (packed-bitfield delta);
#   3. final step-time measurements with the frozen code;
#   4. the headline bench.
set -u
cd /root/repo
LOG=/tmp/tpu_chain_r3b.log

until grep -q TPU_CHAIN_DONE /tmp/tpu_chain_r3.log 2>/dev/null; do sleep 30; done
echo "part A done; starting part B" >> "$LOG"

run() { timeout 580 python -u "$@" >> "$LOG" 2>&1; echo "exit $? : $*" >> "$LOG"; }

for b in 0 1 2; do
  for i in 1 2 3 4 5; do
    grep -q '"held_out_psnr"' "/tmp/bucket_cont_b$b.json" 2>/dev/null && break
    run tools_bucket_cont.py "$b" 800
  done
done

run tools_probe_march.py 12
run tools_perf_step.py bf16 20
run tools_perf_decomp.py step 12 2

# bench.py runs MANUALLY after the factor decision (it depends on the
# adaptive_samples_factor default, set from the continuation results).
echo TPU_CHAIN_B_DONE >> "$LOG"

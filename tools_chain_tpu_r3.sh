# Round-3 TPU measurement chain (sequential — one tunnel client at a time).
#   1. re-warm the bucket-0/1/2 train-step compiles (post-edit code);
#   2. flagship bucket-0 step time (bcast-einsum delta);
#   3. bucket-2 step + march decomposition;
#   4. bucket-factor quality A/B: factor 0.75 then 0.55, 2000 steps each,
#      resumable chunks until each prints DONE.
set -u
cd /root/repo
LOG=/tmp/tpu_chain_r3.log

run() { timeout 580 python -u "$@" >> "$LOG" 2>&1; echo "exit $? : $*" >> "$LOG"; }

for w in occ bucket0 bucket1 bucket2; do run tools_warm_cache.py "$w"; done
run tools_perf_step.py bf16 20
run tools_perf_decomp.py step 12 2
run tools_perf_decomp.py march 12 2
run tools_perf_decomp.py forward 12 2

for f in 0.75 0.45; do
  for i in 1 2 3 4 5 6; do
    grep -q "\"factor\": $f" "/tmp/bucket_ab_f$(echo $f | tr . p).json" 2>/dev/null && break
    run tools_bucket_ab.py "$f" 2000
  done
done
echo TPU_CHAIN_DONE >> "$LOG"

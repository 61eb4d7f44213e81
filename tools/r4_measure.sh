#!/bin/bash
# Round-4 TPU measurement battery.  Run when the axon tunnel is alive.
# Results append to /tmp/r4_measure.log; each section is timeout-bounded
# so one hang cannot eat the whole window.
cd /root/repo
LOG=/tmp/r4_measure.log
echo "=== r4 measure start $(date -u) ===" >> $LOG

# 1. full bench at default B=256 (headline + decode step + host sections)
echo "--- bench default B=256 ---" >> $LOG
FLAC_TPU_BENCH_DEADLINE=900 timeout 1000 python bench.py >> $LOG 2>&1

# 2. headline-only batch-size sweep (new shapes compile once, then cache)
for B in 1024 2048; do
  echo "--- bench headline B=$B ---" >> $LOG
  FLAC_TPU_BENCH_BATCH=$B FLAC_TPU_BENCH_DECODE=0 FLAC_TPU_BENCH_E2E=0 \
    FLAC_TPU_BENCH_DISPATCH_FORM=0 FLAC_TPU_BENCH_DEADLINE=600 \
    timeout 700 python bench.py >> $LOG 2>&1
done

# 3. 24-bit rice2 + f64 parity + pack ablation under the scan fence
#    (VERDICT r3 items 2 and 8)
echo "--- 24bit/f64/pack-ablation steps ---" >> $LOG
timeout 1500 python - >> $LOG 2>&1 <<'EOF'
from bench import device_step_mbps
from flac_codec_tpu.encode import Options
opts = Options.best().no_seektable()
m, ms = device_step_mbps(opts, 256, "f32", pack_budget=26, reps=2, chain=8,
                         bits_per_sample=24)
print("24bit_step_mbps", round(m, 1), "ms", round(ms, 3), flush=True)
m, ms = device_step_mbps(opts, 256, "f64", pack_budget=18, reps=2, chain=8)
print("f64_step_mbps", round(m, 1), "ms", round(ms, 3), flush=True)
m, ms = device_step_mbps(opts, 256, "f32", pack_budget=18, reps=2, chain=8,
                         frame_pack=False)
print("pack_off_mbps", round(m, 1), "ms", round(ms, 3), flush=True)
m, ms = device_step_mbps(opts, 256, "f32", pack_budget=0, reps=2, chain=8,
                         frame_pack=False)
print("plan_only_mbps", round(m, 1), "ms", round(ms, 3), flush=True)
EOF

# 4. word-packing strategy shootout (scatter vs sorted-hint vs
#    sort-segor vs one-hot MXU) at the production shape
echo "--- pack shootout ---" >> $LOG
timeout 900 python tools/profile_pack.py 256 >> $LOG 2>&1

# 5. device-parse compaction timing (VERDICT r3 item 4)
echo "--- compaction ---" >> $LOG
timeout 900 python tools/profile_compaction.py >> $LOG 2>&1

echo "=== r4 measure end $(date -u) ===" >> $LOG

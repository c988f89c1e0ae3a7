#!/usr/bin/env bash
# Round-3 stage 2: every chip measurement, chained after tools/round3_train.sh.
#   1. accuracy<->diversity frontier sweep (tools/frontier_campaign.sh)
#   2. int8 scheme throughput probe (tools/probe_int8_schemes.py, interleaved)
#   3. serving load benchmark, f32 vs uint8 upload (tools/serve_bench.py)
# Results land in /tmp/round3/: read the logs and update RESULTS.md.
set -u
OUT=/tmp/round3
mkdir -p $OUT
cd "$(dirname "$0")/.."
source tools/campaign_lib.sh

# wait for the training stage if it is still running
if [ -f /tmp/round3_train.pid ] && kill -0 "$(cat /tmp/round3_train.pid)" 2>/dev/null; then
  echo "waiting for round3_train ($(cat /tmp/round3_train.pid))..."
  while kill -0 "$(cat /tmp/round3_train.pid)" 2>/dev/null; do sleep 30; done
fi

EXP=$(ls -d /tmp/rich_exp/Hybrid_VAEModel/rich25_*/seed_1 2>/dev/null | head -1)
echo "EXP=$EXP"
require_doctor

run frontier 14400 bash tools/frontier_campaign.sh

run int8_schemes 3600 python tools/probe_int8_schemes.py 5

SB_EXP=${EXP:-/tmp/rich_exp/Hybrid_VAEModel/rich_0.5_0.5/seed_1}
run step_ab 2400 python tools/probe_decode.py step_ab

run serve_f32 1800 python tools/serve_bench.py "$SB_EXP" \
    --levels=16,64,128 --seconds=20 --batch_size=16 --encoder_int8
run serve_u8 1800 python tools/serve_bench.py "$SB_EXP" \
    --levels=16,64,128 --seconds=20 --batch_size=16 --encoder_int8 --uint8

echo "round3 chip campaign done: $(ls $OUT)"

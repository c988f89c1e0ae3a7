#!/usr/bin/env bash
# Poll the tunneled TPU runtime; launch the measurement campaign when it
# recovers.  Bounded: gives up after MAX_HOURS.  Safe to leave running in
# the background — every step is timeout-bounded.
set -u
cd "$(dirname "$0")/.."
MAX_HOURS=${MAX_HOURS:-11}
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
echo "watch start $(date -u +%H:%M:%S), deadline in ${MAX_HOURS}h"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 300 python -m acvae_tpu.cli doctor > /tmp/doctor_last.json 2>&1; then
    echo "tunnel GREEN at $(date -u +%H:%M:%S) — launching campaign"
    bash tools/chip_campaign.sh
    echo "campaign finished at $(date -u +%H:%M:%S)"
    exit 0
  fi
  echo "still wedged at $(date -u +%H:%M:%S); sleeping 600s"
  sleep 600
done
echo "gave up after ${MAX_HOURS}h"
exit 1

#!/usr/bin/env bash
# On-chip measurement campaign for the round-2 decode/compile levers.
# Run from the repo root once `python -m acvae_tpu.cli doctor` is green.
# Each step is timeout-bounded so a re-wedging tunnel cannot hang the run.
# Results land in /tmp/campaign/: read them, update RESULTS.md /
# docs/pallas_notes.md, and flip ACVAE_TOPK / ACVAE_BEAM_LOOP defaults
# in decoding/beam.py if the A/Bs say so.
set -u
OUT=/tmp/campaign
mkdir -p $OUT
cd "$(dirname "$0")/.."
source tools/campaign_lib.sh

require_doctor
run bench        3600 python bench.py
run bench_640    3600 env ACVAE_BENCH_BATCH=640 ACVAE_BENCH_INT8=0 python bench.py
run bench_fused  3600 env ACVAE_FUSED_ATTN=1 ACVAE_BENCH_INT8=0 python bench.py
run loop_ab      3600 python tools/probe_decode.py loop_ab
run topk_ab      2400 python tools/probe_decode.py topk_ab
run attn_ab      2400 python tools/probe_decode.py attn_ab
run slope_all    2400 python tools/probe_decode.py slope all
run slope_bf16   2400 env PROBE_DTYPE=bfloat16 python tools/probe_decode.py slope all
run ablate_V     2400 python tools/probe_decode.py ablate V
run ablate_S     2400 python tools/probe_decode.py ablate S
run ablate_B     2400 python tools/probe_decode.py ablate B
echo "campaign done: $(ls $OUT)"

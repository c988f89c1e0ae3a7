#!/usr/bin/env bash
# Multi-seed flagship runs on the RICH corpus + mean±std aggregation —
# the reference's seed-sweep workflow (utils/report_results.py) exercised
# at scale.  Seeds 2..3 join the existing seed_1 artifacts under the same
# remark dir (same recipe: 10 epochs), then `cli report_results`
# aggregates scores_beam_3.txt across seed_* dirs.
# Run from the repo root once `python -m acvae_tpu.cli doctor` is green.
set -u
OUT=/tmp/seed_campaign
CORPUS=/tmp/rich3000
EXPROOT=/tmp/rich_exp/Hybrid_VAEModel/rich_0.5_0.5
mkdir -p $OUT
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>  (returns the command's rc)
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc -> $OUT/$name.log"
  tail -5 "$OUT/$name.log"
  return $rc
}

if [ ! -f $CORPUS/vocab.pkl ]; then
  run corpus 1800 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli make_synthetic \
      $CORPUS --num_audios=3000 --mel_frames=1024 --rich --seed=0
fi

if ! run doctor 300 python -m acvae_tpu.cli doctor; then
  echo "doctor says the device is dead — aborting"
  exit 1
fi

for SEED in 2 3; do
  if [ ! -d "$EXPROOT/seed_$SEED/best" ]; then
    run train_s$SEED 5400 python -m acvae_tpu.cli train configs/ac_vae.yaml \
        --h5_csv=$CORPUS/mels.csv --caption_file=$CORPUS/text.json \
        --vocab_file=$CORPUS/vocab.pkl --outputpath=/tmp/rich_exp \
        --remark=rich --epochs=10 --seed=$SEED
  fi
  run eval_s$SEED 3600 python -m acvae_tpu.cli evaluate "$EXPROOT/seed_$SEED" \
      $CORPUS/mels.csv $CORPUS/text.json --decode_method=beam --beam_size=3
done

run report 300 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli report_results \
    "$EXPROOT"
cat "$EXPROOT/aggregated_scores.txt" 2>/dev/null
echo "seed campaign done: $(ls $OUT)"

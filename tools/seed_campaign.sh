#!/usr/bin/env bash
# Multi-seed flagship runs on the RICH corpus + mean±std aggregation —
# the reference's seed-sweep workflow (utils/report_results.py) exercised
# at scale.  All seeds share ONE recipe (remark=rich, 10 epochs) so
# `cli report_results` aggregates comparable runs; the 25-epoch flagship
# lives in tools/rich_campaign.sh under its own remark (rich25).
#
# Scores: the full-corpus eval (scores_beam_3.txt) includes the 90% train
# split; the held-out eval (--tag=test on a freshly generated 500-clip
# corpus, scores_beam_3_test.txt) is the leakage-free number — report both.
# Run from the repo root once `python -m acvae_tpu.cli doctor` is green.
set -u
OUT=/tmp/seed_campaign
CORPUS=/tmp/rich3000
TESTSET=/tmp/richtest500
EXPROOT=/tmp/rich_exp/Hybrid_VAEModel/rich_0.5_0.5
mkdir -p $OUT
cd "$(dirname "$0")/.."
source tools/campaign_lib.sh

ensure_rich_corpus
if [ ! -f $TESTSET/vocab.pkl ]; then
  # disjoint generator seed -> a true held-out test set from the same
  # distribution (same event/template banks, fresh clips and wordings)
  if ! run testset 1800 env JAX_PLATFORMS=cpu \
      python -m acvae_tpu.cli make_synthetic "$TESTSET" \
      --num_audios=500 --mel_frames=1024 --rich --seed=7; then
    echo "test-set generation failed — aborting campaign"
    exit 1
  fi
fi
require_doctor

for SEED in 1 2 3; do
  if [ ! -d "$EXPROOT/seed_$SEED/best" ]; then
    run train_s$SEED 5400 python -m acvae_tpu.cli train configs/ac_vae.yaml \
        --h5_csv=$CORPUS/mels.csv --caption_file=$CORPUS/text.json \
        --vocab_file=$CORPUS/vocab.pkl --outputpath=/tmp/rich_exp \
        --remark=rich --epochs=10 --seed=$SEED
  fi
  if [ ! -f "$EXPROOT/seed_$SEED/scores_beam_3.txt" ]; then
    run eval_s$SEED 3600 python -m acvae_tpu.cli evaluate "$EXPROOT/seed_$SEED" \
        $CORPUS/mels.csv $CORPUS/text.json --decode_method=beam --beam_size=3
  fi
  run test_s$SEED 3600 python -m acvae_tpu.cli evaluate "$EXPROOT/seed_$SEED" \
      $TESTSET/mels.csv $TESTSET/text.json --decode_method=beam --beam_size=3 \
      --tag=test
done

# held-out human ceiling for the comparison row
run human_test 3600 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli human_eval \
    $TESTSET/text.json --output=$OUT/human_test.txt

run report 300 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli report_results \
    "$EXPROOT"
run report_test 300 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli report_results \
    "$EXPROOT" --score_file=scores_beam_3_test.txt
cat "$EXPROOT/aggregated_scores.txt" 2>/dev/null
echo "seed campaign done: $(ls $OUT)"

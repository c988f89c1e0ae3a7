#!/usr/bin/env bash
# Round-3 stage 1: corpora + flagship checkpoint.  Produces the single
# trained model every round-3 chip measurement (int8 scheme A/B,
# accuracy<->diversity frontier, decode-chain A/B) evaluates against.
# Reuses the rich25 recipe from tools/rich_campaign.sh so numbers are
# comparable with RESULTS.md round-2 rows.
set -u
echo $$ > /tmp/round3_train.pid  # round3_chip.sh waits on this
OUT=/tmp/round3
CORPUS=/tmp/rich3000
TESTSET=/tmp/richtest500
mkdir -p $OUT
cd "$(dirname "$0")/.."
source tools/campaign_lib.sh

ensure_rich_corpus
if [ ! -f $TESTSET/vocab.pkl ]; then
  if ! run testset 1800 env JAX_PLATFORMS=cpu \
      python -m acvae_tpu.cli make_synthetic "$TESTSET" \
      --num_audios=500 --mel_frames=1024 --rich --seed=7; then
    echo "test-set generation failed — aborting campaign"
    exit 1
  fi
fi
require_doctor

run train 9000 python -m acvae_tpu.cli train configs/ac_vae.yaml \
    --h5_csv=$CORPUS/mels.csv --caption_file=$CORPUS/text.json \
    --vocab_file=$CORPUS/vocab.pkl --outputpath=/tmp/rich_exp \
    --remark=rich25

EXP=$(ls -d /tmp/rich_exp/Hybrid_VAEModel/rich25_*/seed_1 2>/dev/null | head -1)
echo "round3 stage1 done: EXP=$EXP"
ls "$EXP" 2>/dev/null

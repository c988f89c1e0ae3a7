#!/usr/bin/env bash
# Accuracy <-> diversity frontier (VERDICT r2 task 4): decode-only sweep of
# the DBS knobs (diversity_lambda x group_size x temperature) + sampling
# temperature on the HELD-OUT rich test set, against the round-3 flagship.
# The reference exposes exactly these knobs (word_model.py:297,
# base_runner.py:199-265) but never publishes a frontier; this traces >=10
# operating points.  Each point writes eval_output_*_<tag>.json + scores;
# tools/frontier_report.py assembles the CIDEr-vs-diversity table.
#
# Run on the real chip after tools/round3_train.sh.  ~30-60 min (each new
# (beam,group,lambda,temp) combination compiles its own decode program;
# repeated shapes hit the persistent XLA cache).
set -u
OUT=/tmp/frontier
CORPUS=/tmp/rich3000
TESTSET=/tmp/richtest500
EXP=${EXP:-$(ls -d /tmp/rich_exp/Hybrid_VAEModel/rich25_*/seed_1 2>/dev/null | head -1)}
mkdir -p $OUT
cd "$(dirname "$0")/.."
source tools/campaign_lib.sh

if [ -z "${EXP:-}" ] || [ ! -d "$EXP/best" ]; then
  echo "no trained flagship at /tmp/rich_exp/Hybrid_VAEModel/rich25_*/seed_1 — run tools/round3_train.sh first"
  exit 1
fi
require_doctor

ev() {  # ev <tag> <timeout> <extra evaluate args...>
  local tag=$1 t=$2; shift 2
  run "ev_$tag" "$t" python -m acvae_tpu.cli evaluate "$EXP" \
      $TESTSET/mels.csv $TESTSET/text.json --tag="$tag" "$@"
}

# baseline: plain beam
ev beam3 3600 --decode_method=beam --beam_size=3

# DBS lambda sweep at the reference-ish operating point (beam 8, 4 groups)
for LAM in 0.2 0.5 1.0 2.0; do
  ev "dbs_l${LAM/./}" 3600 --decode_method=dbs --beam_size=8 --group_size=4 \
      --group_nbest=true --diversity_lambda=$LAM
done
# DBS temperature sweep at lambda 0.5
for TEMP in 1.5 2.0; do
  ev "dbs_t${TEMP/./}" 3600 --decode_method=dbs --beam_size=8 --group_size=4 \
      --group_nbest=true --diversity_lambda=0.5 --temperature=$TEMP
done
# group-structure extremes
ev dbs_g8 3600 --decode_method=dbs --beam_size=8 --group_size=8 \
    --group_nbest=true --diversity_lambda=0.5
ev dbs_g2 3600 --decode_method=dbs --beam_size=8 --group_size=2 \
    --group_nbest=true --diversity_lambda=0.5
# sampling temperature (5 candidates per clip, like the reference's
# multi-candidate diversity eval)
for TEMP in 0.7 1.0 1.3; do
  ev "samp_t${TEMP/./}" 3600 --decode_method=sample --num_candidates=5 \
      --temp=$TEMP
done

# human/reference ceiling for the diversity columns
run human 3600 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli human_eval \
    $TESTSET/text.json --output=$OUT/human.txt

run report 1800 env JAX_PLATFORMS=cpu python tools/frontier_report.py "$EXP" \
    --train_corpus=$CORPUS/text.json --human=$OUT/human.txt --out=$OUT/frontier.md
cat $OUT/frontier.md 2>/dev/null
echo "frontier campaign done: $(ls $OUT)"

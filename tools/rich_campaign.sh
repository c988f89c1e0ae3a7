#!/usr/bin/env bash
# Reference-scale run on the RICH synthetic corpus (realistic language
# statistics — ~200-word vocab, synonym variation, consensus-limited CIDEr
# regime; see acvae_tpu/data/synthetic.py::make_synthetic_clotho_rich).
# Trains the FULL 25-epoch flagship recipe under its own remark (rich25) so
# it cannot mix with tools/seed_campaign.sh's 10-epoch seed sweep
# (remark=rich) in a report_results aggregation.
#
# The in-corpus evals below include the 90% train split (leakage); the
# held-out numbers come from seed_campaign.sh's --tag=test stage — treat
# these as convergence/scale evidence, not externally comparable scores.
# Run from the repo root once `python -m acvae_tpu.cli doctor` is green.
# Results land in /tmp/rich_campaign/: read them and update RESULTS.md.
set -u
OUT=/tmp/rich_campaign
CORPUS=/tmp/rich3000
mkdir -p $OUT
cd "$(dirname "$0")/.."
source tools/campaign_lib.sh

# corpus + human ceilings are host-side (CPU-forced through the CLI)
ensure_rich_corpus
run human 3600 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli human_eval \
    $CORPUS/text.json --output=$OUT/human.txt

require_doctor

# flagship recipe (full 25 epochs — the rich corpus converges slower than
# the small grammar; beam-3 CIDEr validation per epoch)
run train 9000 python -m acvae_tpu.cli train configs/ac_vae.yaml \
    --h5_csv=$CORPUS/mels.csv --caption_file=$CORPUS/text.json \
    --vocab_file=$CORPUS/vocab.pkl --outputpath=/tmp/rich_exp \
    --remark=rich25

EXP=$(ls -d /tmp/rich_exp/Hybrid_VAEModel/rich25_*/seed_1 2>/dev/null | head -1)
if [ -n "${EXP:-}" ]; then
  run eval_beam 3600 python -m acvae_tpu.cli evaluate "$EXP" \
      $CORPUS/mels.csv $CORPUS/text.json --decode_method=beam --beam_size=3
  run eval_dbs 3600 python -m acvae_tpu.cli evaluate "$EXP" \
      $CORPUS/mels.csv $CORPUS/text.json --decode_method=dbs --beam_size=8 \
      --group_size=4 --group_nbest=true
  # evaluate writes eval_output_{method}_{beam}.json (cli/main.py:868)
  run div_dbs 1800 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli diversity \
      "$EXP/eval_output_dbs_8.json" --train_corpus=$CORPUS/text.json
fi
# fresh-session throughput re-confirmation while the tunnel is green
run bench 3600 python bench.py

echo "rich campaign done: $(ls $OUT)"

#!/usr/bin/env bash
# Reference-scale run on the RICH synthetic corpus (realistic language
# statistics — ~200-word vocab, synonym variation, consensus-limited CIDEr
# regime; see acvae_tpu/data/synthetic.py::make_synthetic_clotho_rich).
# Run from the repo root once `python -m acvae_tpu.cli doctor` is green.
# Results land in /tmp/rich_campaign/: read them and update RESULTS.md.
set -u
OUT=/tmp/rich_campaign
CORPUS=/tmp/rich3000
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

# corpus + human ceilings are host-side (CPU-forced through the CLI)
if [ ! -f $CORPUS/vocab.pkl ]; then
  run corpus 1800 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli make_synthetic \
      $CORPUS --num_audios=3000 --mel_frames=1024 --rich --seed=0
fi
run human 3600 env JAX_PLATFORMS=cpu python -m acvae_tpu.cli human_eval \
    $CORPUS/text.json --output=$OUT/human.txt

# gate the TPU-dependent stages on a live device (doctor exits nonzero on a
# wedged tunnel — burning the train/eval timeouts against it is ~4 h of
# nothing)
if ! run doctor 300 python -m acvae_tpu.cli doctor; then
  echo "doctor says the device is dead — skipping TPU stages"
  exit 1
fi

# flagship recipe (full 25 epochs — the rich corpus converges slower than
# the small grammar; beam-3 CIDEr validation per epoch)
run train 7200 python -m acvae_tpu.cli train configs/ac_vae.yaml \
    --h5_csv=$CORPUS/mels.csv --caption_file=$CORPUS/text.json \
    --vocab_file=$CORPUS/vocab.pkl --outputpath=/tmp/rich_exp \
    --remark=rich

EXP=$(ls -d /tmp/rich_exp/Hybrid_VAEModel/rich_*/seed_1 2>/dev/null | head -1)
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

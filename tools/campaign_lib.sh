# Shared helpers for the tools/*_campaign.sh measurement scripts.
# Source after setting OUT (log dir); CORPUS helpers also want CORPUS set.
#   source "$(dirname "$0")/campaign_lib.sh"

run() {  # run <name> <timeout_s> <cmd...>  (returns the command's rc)
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc -> $OUT/$name.log"
  tail -5 "$OUT/$name.log"
  return $rc
}

# generate the rich corpus into $CORPUS if absent; abort the campaign when
# generation fails (burning the train/eval timeouts against a missing
# corpus is hours of nothing)
ensure_rich_corpus() {  # ensure_rich_corpus [num_audios] [mel_frames]
  local n=${1:-3000} frames=${2:-1024} seed=${3:-0}
  if [ ! -f "$CORPUS/vocab.pkl" ]; then
    if ! run corpus 1800 env JAX_PLATFORMS=cpu \
        python -m acvae_tpu.cli make_synthetic "$CORPUS" \
        --num_audios="$n" --mel_frames="$frames" --rich --seed="$seed"; then
      echo "corpus generation failed — aborting campaign"
      exit 1
    fi
  fi
}

# gate TPU-dependent stages on a live device (doctor exits nonzero on a
# wedged tunnel)
require_doctor() {
  if ! run doctor 300 python -m acvae_tpu.cli doctor; then
    echo "doctor says the device is dead — aborting TPU stages"
    exit 1
  fi
}

#!/bin/bash
# Realism-corpus chain (VERDICT r4 item 4): teacher -> NAR distill
# (trim-offset-corrected oracle durations) -> HiFi-GAN -> TTS4ASR adapt
# -> serving check, all on /root/rehearsal_noisy (7,918 clips with
# silence tails + noise floor + breath onset; the closest offline proxy
# for the reference's real-audio pipeline and the only end-to-end
# exercise of the trim contract, /root/reference/src/utils.py:249).
# Run: bash scripts/run_noisy_chain.sh [logdir]
set -u
W=/root/rehearsal_noisy
LOG=${1:-/tmp/noisy_chain}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {
  name=$1; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  timeout 7200 python "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== [$name] rc=$rc $(date +%H:%M:%S) ==="
  tail -5 "$LOG/$name.log"
  if [ $rc -ne 0 ]; then echo "CHAIN STOPPED at $name"; exit $rc; fi
}

if [ ! -f "$W/oracle_durs_fixed.npz" ]; then
  step oracle_fix scripts/fix_noisy_oracle.py --workdir "$W"
fi

if [ ! -d "$W/teacher_ckpt" ]; then
  step teacher scripts/corpus_convergence.py \
    --shard "$W/full_train.unsh" --steps 8000 --ga_weight 0.3 \
    --save_path "$W/teacher_ckpt"
fi

step distill scripts/corpus_nar_distill.py \
  --shard "$W/full_train.unsh" --teacher "$W/teacher_ckpt" \
  --dur_source oracle --oracle_durs "$W/oracle_durs_fixed.npz" \
  --steps 3000 --prenet_drop 0.1 --save_path "$W/nar_pv.pkl"

step vocoder scripts/corpus_vocoder.py \
  --workdir "$W" --steps 4000 --gen hifigan \
  --save_path "$W/vocoder_hifigan.pkl"

step gta scripts/gta_vocoder_finetune.py \
  --shard "$W/full_train.unsh" --wav_shard "$W/full_train.unwv" \
  --metadata "$W/metadata.csv" --nar "$W/nar_pv.pkl" \
  --vocoder "$W/vocoder_hifigan.pkl" --steps 2000 \
  --oracle_durs "$W/oracle_durs_fixed.npz" \
  --save_path "$W/vocoder_gta.pkl"

step adapt scripts/ctc_nar_adapt.py \
  --shard "$W/full_train.unsh" --metadata "$W/metadata.csv" \
  --teacher "$W/teacher_ckpt" --nar "$W/nar_pv.pkl" \
  --vocoder "$W/vocoder_gta.pkl" --loop_mels \
  --save_path "$W/ctc_adapted_loop.pkl"

step serving scripts/corpus_serving_check.py \
  --shard "$W/full_train.unsh" --metadata "$W/metadata.csv" \
  --teacher "$W/teacher_ckpt" --nar "$W/nar_pv.pkl" \
  --vocoder "$W/vocoder_gta.pkl"

echo "NOISY CHAIN COMPLETE"

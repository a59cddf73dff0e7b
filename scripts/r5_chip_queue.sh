#!/bin/bash
# Round-5 serial chip-job queue (VERDICT r4->r5 items 2, 3, 4, 5).
# One real chip through the tunnel -- jobs must serialize. Logs under
# /tmp/r5q/<name>.log; per-step rc + wall printed to the queue log.
# Run: nohup bash scripts/r5_chip_queue.sh > /tmp/r5q/queue.log 2>&1 &
set -u
LOG=/tmp/r5q
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {
  name=$1; to=$2; shift 2
  t0=$(date +%s)
  echo "=== [$name] start $(date +%H:%M:%S) ==="
  /usr/bin/timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== [$name] rc=$rc wall=$(( $(date +%s) - t0 ))s $(date +%H:%M:%S) ==="
  tail -3 "$LOG/$name.log"
}

# --- item 3: close the full audio loop (GTA vocoder fine-tune) ---
step gta 5400 python scripts/gta_vocoder_finetune.py
step adapt_gta 5400 python scripts/ctc_nar_adapt.py --loop_mels \
  --vocoder /root/rehearsal/vocoder_gta.pkl --steps 2000 \
  --save_path /root/rehearsal/ctc_adapted_gta.pkl
step serving_gta 3600 python scripts/corpus_serving_check.py \
  --vocoder /root/rehearsal/vocoder_gta.pkl

# --- item 5: MFU at the recipe config + long-T probes ---
step mfu_rf4 3000 python scripts/full_step_mfu.py --rf 4
step wide512 2400 python scripts/wide_probe.py --skip_attn --batches 32 \
  --policies dots --tmel 512 --ttext 192 --iters 2
step wide1024 3000 python scripts/wide_probe.py --skip_attn --batches 32 \
  --policies dots --tmel 1024 --ttext 192 --iters 2

# --- item 2: decode-lever learnability at corpus scale ---
step ab 7200 python scripts/decode_lever_corpus_ab.py

# --- item 4: realism-corpus chain (longest; host quiet by now) ---
t0=$(date +%s)
echo "=== [noisy] start $(date +%H:%M:%S) ==="
bash scripts/run_noisy_chain.sh /tmp/noisy_chain > "$LOG/noisy.log" 2>&1
echo "=== [noisy] rc=$? wall=$(( $(date +%s) - t0 ))s $(date +%H:%M:%S) ==="

echo "QUEUE DONE $(date +%H:%M:%S)"

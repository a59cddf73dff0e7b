#!/usr/bin/env bash
# Download LJSpeech-1.1, create splits, and build the offline mel cache.
# Parity: reference src/get_dataset.sh:1-16 (wget tarball -> untar -> copy
# split CSVs -> run the offline preprocessor).
set -euo pipefail

DATA_DIR="${1:-./data}"
URL="https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2"

mkdir -p "$DATA_DIR"
cd "$DATA_DIR"

if [ ! -d LJSpeech-1.1 ]; then
    echo "[get_dataset] downloading LJSpeech-1.1..."
    wget -c "$URL"
    tar -xjf LJSpeech-1.1.tar.bz2
fi

cd - >/dev/null
echo "[get_dataset] staging the reference split CSVs (12500/12300/200/300/300)..."
python - <<EOF
import shutil
from unast_tpu.data.splits import REFERENCE_SPLITS_DIR
shutil.copytree(REFERENCE_SPLITS_DIR, "$DATA_DIR/LJSpeech-1.1/splits",
                dirs_exist_ok=True)
print("splits staged from", REFERENCE_SPLITS_DIR)
EOF

echo "[get_dataset] building mel/mag cache..."
python -m unast_tpu.data.prepare \
    --data_path "$DATA_DIR/LJSpeech-1.1" \
    --cache_dir "$DATA_DIR/LJSpeech-1.1/mel_cache"
echo "[get_dataset] done"

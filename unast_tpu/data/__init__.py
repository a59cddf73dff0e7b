"""Data pipeline: LJSpeech manifest + splits, offline mel/mag cache,
fixed-shape batching, and a synthetic dataset for environments without the
corpus. Parity targets: src/preprocess.py (datasets + collation),
src/prepare_data.py (offline preprocessor), src/data/splits/*.csv and
src/get_dataset.sh (splits), src/train.py:32-78 (BatchGetter)."""

from .dataset import LJSpeechDataset, SyntheticSpeechDataset, load_manifest
from .batching import collate, BatchIterator, BatchGetter
from .splits import make_splits, SPLIT_SIZES

__all__ = [
    "LJSpeechDataset", "SyntheticSpeechDataset", "load_manifest",
    "collate", "BatchIterator", "BatchGetter",
    "make_splits", "SPLIT_SIZES",
]

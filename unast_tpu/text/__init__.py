"""L0 text frontend: symbols, cleaners, number normalization, G2P."""

from .symbols import (
    symbols, SYMBOL_TO_ID, ID_TO_SYMBOL, PAD_IDX, SOS_IDX, EOS_IDX, VOCAB_SIZE,
)
from .cleaners import clean_text, english_cleaners, basic_cleaners, transliteration_cleaners
from .numbers import normalize_numbers, number_to_words
from .phonemizer import (
    raw_text_to_phoneme_ids, text_to_sequence, sequence_to_text, convert,
    word_to_ipa, load_lexicon,
)

__all__ = [
    "symbols", "SYMBOL_TO_ID", "ID_TO_SYMBOL", "PAD_IDX", "SOS_IDX",
    "EOS_IDX", "VOCAB_SIZE", "clean_text", "english_cleaners",
    "basic_cleaners", "transliteration_cleaners", "normalize_numbers",
    "number_to_words", "raw_text_to_phoneme_ids", "text_to_sequence",
    "sequence_to_text", "convert", "word_to_ipa", "load_lexicon",
]

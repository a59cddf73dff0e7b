"""Symbol inventory for the text frontend.

Parity with reference `src/data/symbols.py:12-26`: a 46-symbol vocabulary of
pad / sos / eos / space / failure marker, 37 IPA phonemes, and four
pass-through letters (c, q, x, y) for words the G2P cannot transcribe.
"""

PAD = "_"
SOS = "-"
EOS = "~"
SPACE = " "
# Marks a word the grapheme-to-phoneme layer failed to transcribe.
FAIL = "*"

# IPA phoneme inventory (reference src/data/symbols.py:17).
PHONEMES = [
    "ˈ", "a", "b", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m", "n",
    "o", "p", "r", "s", "t", "u", "v", "w", "z", "æ", "ð", "ŋ", "ɑ", "ɔ",
    "ə", "ɛ", "ɪ", "ʃ", "ʊ", "ʒ", "ʤ", "ʧ", "θ",
]

# Letters that pass through unchanged when a word is out of vocabulary
# (reference src/data/symbols.py:21).
PASSTHROUGH_LETTERS = ["c", "q", "x", "y"]

symbols = [PAD, SOS, EOS, SPACE, FAIL] + PHONEMES + PASSTHROUGH_LETTERS

SYMBOL_TO_ID = {s: i for i, s in enumerate(symbols)}
ID_TO_SYMBOL = {i: s for i, s in enumerate(symbols)}

PAD_IDX = SYMBOL_TO_ID[PAD]   # 0
SOS_IDX = SYMBOL_TO_ID[SOS]   # 1
EOS_IDX = SYMBOL_TO_ID[EOS]   # 2

VOCAB_SIZE = len(symbols)     # 46

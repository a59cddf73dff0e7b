"""Tests for the L0 text frontend (symbols, cleaners, numbers, G2P)."""

import pytest

from unast_tpu.text import (
    symbols, SYMBOL_TO_ID, PAD_IDX, SOS_IDX, EOS_IDX, VOCAB_SIZE,
    normalize_numbers, number_to_words, english_cleaners,
    raw_text_to_phoneme_ids, text_to_sequence, sequence_to_text, convert,
)


class TestSymbols:
    def test_vocab_size_is_46(self):
        assert VOCAB_SIZE == 46

    def test_special_ids(self):
        assert PAD_IDX == 0 and SOS_IDX == 1 and EOS_IDX == 2
        assert symbols[0] == "_" and symbols[1] == "-" and symbols[2] == "~"
        assert symbols[3] == " " and symbols[4] == "*"

    def test_unique(self):
        assert len(set(symbols)) == len(symbols)

    def test_passthrough_letters_present(self):
        for ch in "cqxy":
            assert ch in SYMBOL_TO_ID


class TestNumbers:
    @pytest.mark.parametrize("n,words", [
        (0, "zero"), (7, "seven"), (13, "thirteen"), (20, "twenty"),
        (21, "twenty-one"), (45, "forty-five"), (100, "one hundred"),
        (101, "one hundred one"), (999, "nine hundred ninety-nine"),
        (1000, "one thousand"),
        (1234567, "one million, two hundred thirty-four thousand, five hundred sixty-seven"),
    ])
    def test_cardinals(self, n, words):
        assert number_to_words(n) == words

    @pytest.mark.parametrize("text,out", [
        ("1st", "first"), ("2nd", "second"), ("3rd", "third"),
        ("4th", "fourth"), ("5th", "fifth"), ("12th", "twelfth"),
        ("20th", "twentieth"), ("21st", "twenty-first"),
        ("100th", "one hundredth"),
    ])
    def test_ordinals(self, text, out):
        assert normalize_numbers(text) == out

    def test_years(self):
        assert normalize_numbers("1920") == "nineteen twenty"
        assert normalize_numbers("1905") == "nineteen oh five"
        assert normalize_numbers("2000") == "two thousand"
        assert normalize_numbers("2008") == "two thousand eight"
        assert normalize_numbers("1800") == "eighteen hundred"

    def test_currency(self):
        assert normalize_numbers("$1.50") == "one dollar, fifty cents"
        assert normalize_numbers("$2") == "two dollars"
        assert normalize_numbers("$0.01") == "zero point zero one" or \
            "cent" in normalize_numbers("$.01")
        assert normalize_numbers("£100") == "one hundred pounds"

    def test_decimal(self):
        assert normalize_numbers("3.14") == "three point fourteen"

    def test_commas_removed(self):
        assert normalize_numbers("12,345") == \
            "twelve thousand, three hundred forty-five"


class TestCleaners:
    def test_english_pipeline(self):
        assert english_cleaners("Dr. Smith paid $5 in 1920.") == \
            "doctor smith paid five dollars in nineteen twenty."

    def test_ascii_fold(self):
        assert english_cleaners("café naïve Zürich") == "cafe naive zurich"

    def test_whitespace_collapse(self):
        assert english_cleaners("a   b\t\nc") == "a b c"

    def test_abbreviations(self):
        out = english_cleaners("Mr. and Mrs. Jones met Lt. Col. Brown.")
        assert "mister" in out and "misess" in out
        assert "lieutenant" in out and "colonel" in out


class TestPhonemizer:
    def test_ids_in_vocab_and_eos(self):
        seq = raw_text_to_phoneme_ids("Printing, in the only sense.")
        assert seq[-1] == EOS_IDX
        assert all(0 <= i < VOCAB_SIZE for i in seq)
        assert PAD_IDX not in seq
        assert EOS_IDX not in seq[:-1]

    def test_lexicon_words(self):
        assert convert("the") == "ðə"
        assert convert("hello world") == "hɛˈloʊ wərld"

    def test_rule_fallback_stays_in_inventory(self):
        seq = raw_text_to_phoneme_ids("zyzzyva qwertish blorp")
        assert all(0 <= i < VOCAB_SIZE for i in seq)

    def test_strict_oov_marks_failures(self):
        seq = raw_text_to_phoneme_ids("flumph", strict_oov=True)
        assert SYMBOL_TO_ID["*"] in seq

    def test_round_trip(self):
        seq = raw_text_to_phoneme_ids("the dog")
        text = sequence_to_text(seq)
        assert text == "ðə dɔg~"

    def test_arpabet_braces(self):
        seq = text_to_sequence("{HH AH0 L OW1} there", ["english_cleaners"])
        # HH AH L OW -> h ə l ˈoʊ
        expected_prefix = [SYMBOL_TO_ID[c] for c in "həlˈoʊ"]
        assert seq[: len(expected_prefix)] == expected_prefix
        assert seq[-1] == EOS_IDX

    def test_deterministic(self):
        t = "The quick brown fox jumps over 12 lazy dogs."
        assert raw_text_to_phoneme_ids(t) == raw_text_to_phoneme_ids(t)


def test_cmudict_wrapper():
    import io
    from unast_tpu.text.cmudict import CMUDict
    data = io.StringIO(
        "HELLO  HH AH0 L OW1\n"
        "HELLO(1)  HH EH0 L OW1\n"
        "WORLD  W ER1 L D\n"
        ";;; comment line\n"
        "BADSYM  Q9 X7\n")
    d = CMUDict(data)
    assert len(d) == 2
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("WORLD") == ["W ER1 L D"]
    assert d.lookup("missing") is None
    data.seek(0)
    d2 = CMUDict(data, keep_ambiguous=False)
    assert d2.lookup("hello") is None and d2.lookup("world") is not None


class TestMorphDerivation:
    """text/morph.py: inflection phonology from base lexicon entries."""

    def test_regular_suffixes(self):
        from unast_tpu.text.phonemizer import word_to_ipa
        # plural voicing: voiceless+s, voiced+z, sibilant+ɪz
        assert word_to_ipa("quotes") == "kwoʊts"
        assert word_to_ipa("rifles") == "ˈraɪfəlz"
        # round-5 stress discipline: a derived form that becomes
        # polysyllabic is stress-marked on its base syllable (CMU:
        # CHURCHES CH ER1 CH AH0 Z).
        assert word_to_ipa("churches") == "ˈʧərʧəz"
        # -ed voicing: t/d+ɪd, voiceless+t, voiced+d
        assert word_to_ipa("visited") == "ˈvɪzətəd"
        assert word_to_ipa("walked") == "wɔkt"
        assert word_to_ipa("charged") == "ʧɑrʤd"
        # spelling adjustments: -ies->y, silent-e restore, doubling
        assert word_to_ipa("cities") == "ˈsɪtiz"
        assert word_to_ipa("making") == "ˈmeɪkɪŋ"  # CMU M EY1 K IH0 NG
        assert word_to_ipa("stopped") == "stɑpt"

    def test_stacked_and_prefixed(self):
        from unast_tpu.text.phonemizer import word_to_ipa
        assert word_to_ipa("buildings") == "ˈbɪldɪŋz"   # build+ing+s
        # stress-neutral prefix puts primary on the base (CMU: UNKNOWN
        # AH0 N N OW1 N), geminate n+n kept across the prefix boundary.
        assert word_to_ipa("unknown") == "ənˈnoʊn"
        assert word_to_ipa("reportedly") == "rɪˈpɔrtədli"

    def test_exact_lexicon_wins_over_morph(self):
        # 'does' could derive as do+z (duz); the irregular lexicon entry
        # must win (reference eng_to_ipa is a dict lookup: CMU has it).
        from unast_tpu.text.phonemizer import word_to_ipa
        assert word_to_ipa("does") == "dəz"
        assert word_to_ipa("said") == "sɛd"

    def test_quote_apostrophe_stripped(self):
        from unast_tpu.text.phonemizer import word_to_ipa
        assert word_to_ipa("'flowery") == word_to_ipa("flowery")

    def test_static_lexicon_inventory_clean(self):
        from unast_tpu.text.phonemizer import (STATIC_LEXICON, _fold_ipa)
        from unast_tpu.text.symbols import SYMBOL_TO_ID
        assert len(STATIC_LEXICON) > 4000
        for w, ipa in STATIC_LEXICON.items():
            folded = _fold_ipa(ipa)
            assert folded and all(ch in SYMBOL_TO_ID for ch in folded), (
                w, ipa)

    def test_ljspeech_token_coverage(self):
        """VERDICT r3 item 4 gate: lexicon(+morph) >= 95% of word tokens
        on the real LJSpeech transcripts (reference G2P is a CMU dict
        lookup, src/data/__init__.py:18-32)."""
        import collections
        import os
        from unast_tpu.data.dataset import load_manifest
        from unast_tpu.data.splits import REFERENCE_SPLITS_DIR
        from unast_tpu.text import phonemizer as PH
        from unast_tpu.text import morph as M
        from unast_tpu.text.cleaners import clean_text
        words = collections.Counter()
        for split in ("full_train", "val", "test"):
            for fid, text in load_manifest(
                    os.path.join(REFERENCE_SPLITS_DIR, f"{split}.csv")):
                cleaned = clean_text(text, ["english_cleaners"])
                for m in PH._word_re.finditer(cleaned):
                    words[m.group(0)] += 1
        total = sum(words.values())
        hit = 0
        for w, c in words.items():
            ws = w.strip("'")
            if (PH.lexicon_lookup(w) or PH.lexicon_lookup(ws)
                    or M.derive(w, PH.lexicon_lookup)
                    or M.derive(ws, PH.lexicon_lookup)):
                hit += c
        assert hit / total >= 0.95, hit / total


class TestLexiconFidelityAudit:
    """Pronunciation-fidelity invariants (round-5 audit, VERDICT r4
    item 6): the offline stand-in for the CMU-backed validation the
    reference inherits via eng_to_ipa (src/data/__init__.py:18-32)."""

    def test_audit_invariants_hold(self):
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "scripts"))
        from g2p_lexicon_report import audit_lexicon
        stats = audit_lexicon()
        assert stats["zero_nuclei"] == 0
        assert stats["polysyll_stress_missing"] == 0
        assert stats["multi_stress"] == 0
        # The remaining morph-vs-direct disagreements are the documented
        # genuinely-irregular set (city != cite+y, clothes != cloth+s);
        # a jump past this bound means an engine or entry regression.
        assert stats["morph_mismatch"] <= 60, stats["morph_mismatch"]

"""Grapheme-to-phoneme frontend: raw text -> IPA phonemes -> symbol IDs.

Parity target: reference `src/data/__init__.py:18-96` (`raw_text_to_phoneme_ids`,
`text_to_sequence`, `sequence_to_text`). The reference delegates G2P to the
`eng_to_ipa` package (a CMU-dict lookup that appends '*' to words it cannot
transcribe). That package is unavailable here, so G2P is implemented from
scratch as:

  1. a built-in lexicon of frequent English words (IPA restricted to the
     46-symbol inventory), extensible via `load_lexicon()`;
  2. a deterministic longest-match letter-to-sound rule engine for everything
     else (an improvement over the reference, which emits `word*` for OOV);
  3. a `strict_oov=True` mode reproducing the reference's `word*` behavior.

All emitted phonemes are folded into the model's 46-symbol inventory
(e.g. ʌ->ə, ɒ->ɑ, diphthongs as two-symbol sequences), whereas the reference
silently *drops* out-of-inventory IPA produced by eng_to_ipa
(`src/data/__init__.py:96`). ARPAbet-in-braces input is mapped to IPA (in the
reference this path emits '@'-prefixed symbols outside the vocabulary and is
therefore dead; here it works).
"""

import re
from typing import Dict, List

from .cleaners import clean_text
from .symbols import EOS, SYMBOL_TO_ID, ID_TO_SYMBOL

_curly_re = re.compile(r"(.*?)\{(.+?)\}(.*)")
_word_re = re.compile(r"[a-z']+")

# Fold out-of-inventory IPA into the 46-symbol set.
_IPA_FOLD = {
    "ʌ": "ə", "ɒ": "ɑ", "ɝ": "ər", "ɚ": "ər", "ˌ": "", "ː": "",
    "ɾ": "t", "ʔ": "t", "ɡ": "g", "ɹ": "r", "ʦ": "ts",
}

# ARPAbet -> IPA (inventory-restricted); stress digit 1 becomes 'ˈ'.
ARPABET_TO_IPA = {
    "AA": "ɑ", "AE": "æ", "AH": "ə", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "B": "b", "CH": "ʧ", "D": "d", "DH": "ð", "EH": "ɛ", "ER": "ər",
    "EY": "eɪ", "F": "f", "G": "g", "HH": "h", "IH": "ɪ", "IY": "i",
    "JH": "ʤ", "K": "k", "L": "l", "M": "m", "N": "n", "NG": "ŋ",
    "OW": "oʊ", "OY": "ɔɪ", "P": "p", "R": "r", "S": "s", "SH": "ʃ",
    "T": "t", "TH": "θ", "UH": "ʊ", "UW": "u", "V": "v", "W": "w",
    "Y": "j", "Z": "z", "ZH": "ʒ",
}

# Frequent-word lexicon (IPA already inventory-restricted). Extensible at
# runtime with load_lexicon(path) for a full CMU-derived dictionary.
CORE_LEXICON: Dict[str, str] = {
    "a": "ə", "an": "ən", "the": "ðə", "and": "ænd", "of": "əv", "to": "tu",
    "in": "ɪn", "is": "ɪz", "it": "ɪt", "that": "ðæt", "was": "wəz",
    "he": "hi", "she": "ʃi", "for": "fɔr", "on": "ɑn", "are": "ɑr",
    "as": "æz", "with": "wɪð", "his": "hɪz", "her": "hər", "they": "ðeɪ",
    "i": "aɪ", "at": "æt", "be": "bi", "this": "ðɪs", "have": "hæv",
    "from": "frəm", "or": "ɔr", "one": "wən", "had": "hæd", "by": "baɪ",
    "word": "wərd", "words": "wərdz", "but": "bət", "not": "nɑt",
    "what": "wət", "all": "ɔl", "were": "wər", "we": "wi", "when": "wɛn",
    "your": "jɔr", "can": "kæn", "said": "sɛd", "there": "ðɛr",
    "use": "juz", "each": "iʧ", "which": "wɪʧ", "do": "du", "how": "haʊ",
    "their": "ðɛr", "if": "ɪf", "will": "wɪl", "up": "əp", "other": "ˈəðər",
    "about": "əˈbaʊt", "out": "aʊt", "many": "ˈmɛni", "then": "ðɛn",
    "them": "ðɛm", "these": "ðiz", "so": "soʊ", "some": "səm",
    "would": "wʊd", "make": "meɪk", "like": "laɪk", "him": "hɪm",
    "into": "ˈɪntu", "time": "taɪm", "has": "hæz", "look": "lʊk",
    "two": "tu", "more": "mɔr", "write": "raɪt", "go": "goʊ",
    "see": "si", "number": "ˈnəmbər", "no": "noʊ", "way": "weɪ",
    "could": "kʊd", "people": "ˈpipəl", "my": "maɪ", "than": "ðæn",
    "first": "fərst", "water": "ˈwɔtər", "been": "bɪn", "who": "hu",
    "its": "ɪts", "now": "naʊ", "did": "dɪd", "get": "gɛt",
    "come": "kəm", "made": "meɪd", "may": "meɪ", "part": "pɑrt",
    "over": "ˈoʊvər", "new": "nu", "sound": "saʊnd", "take": "teɪk",
    "only": "ˈoʊnli", "little": "ˈlɪtəl", "work": "wərk", "know": "noʊ",
    "place": "pleɪs", "year": "jɪr", "years": "jɪrz", "live": "lɪv",
    "me": "mi", "back": "bæk", "give": "gɪv", "most": "moʊst",
    "very": "ˈvɛri", "after": "ˈæftər", "thing": "θɪŋ", "things": "θɪŋz",
    "our": "ˈaʊər", "just": "ʤəst", "name": "neɪm", "good": "gʊd",
    "sentence": "ˈsɛntəns", "man": "mæn", "think": "θɪŋk", "say": "seɪ",
    "great": "greɪt", "where": "wɛr", "help": "hɛlp", "through": "θru",
    "much": "məʧ", "before": "bɪˈfɔr", "line": "laɪn", "right": "raɪt",
    "too": "tu", "mean": "min", "old": "oʊld", "any": "ˈɛni",
    "same": "seɪm", "tell": "tɛl", "boy": "bɔɪ", "follow": "ˈfɑloʊ",
    "came": "keɪm", "want": "wɑnt", "show": "ʃoʊ", "also": "ˈɔlsoʊ",
    "around": "əˈraʊnd", "three": "θri", "small": "smɔl", "set": "sɛt",
    "put": "pʊt", "end": "ɛnd", "does": "dəz", "another": "əˈnəðər",
    "well": "wɛl", "large": "lɑrʤ", "must": "məst", "big": "bɪg",
    "even": "ˈivɪn", "such": "səʧ", "because": "bɪˈkɔz", "turn": "tərn",
    "here": "hɪr", "why": "waɪ", "ask": "æsk", "went": "wɛnt",
    "men": "mɛn", "read": "rid", "need": "nid", "land": "lænd",
    "different": "ˈdɪfərənt", "home": "hoʊm", "us": "əs", "move": "muv",
    "try": "traɪ", "kind": "kaɪnd", "hand": "hænd", "picture": "ˈpɪkʧər",
    "again": "əˈgɛn", "change": "ʧeɪnʤ", "off": "ɔf", "play": "pleɪ",
    "spell": "spɛl", "air": "ɛr", "away": "əˈweɪ", "animal": "ˈænəməl",
    "house": "haʊs", "point": "pɔɪnt", "page": "peɪʤ", "letter": "ˈlɛtər",
    "mother": "ˈməðər", "answer": "ˈænsər", "found": "faʊnd",
    "study": "ˈstədi", "still": "stɪl", "learn": "lərn", "should": "ʃʊd",
    "world": "wərld", "high": "haɪ", "every": "ˈɛvəri", "near": "nɪr",
    "add": "æd", "food": "fud", "between": "bɪˈtwin", "own": "oʊn",
    "below": "bɪˈloʊ", "country": "ˈkəntri", "plant": "plænt",
    "last": "læst", "school": "skul", "father": "ˈfɑðər", "keep": "kip",
    "tree": "tri", "never": "ˈnɛvər", "start": "stɑrt", "city": "ˈsɪti",
    "earth": "ərθ", "eye": "aɪ", "eyes": "aɪz", "light": "laɪt",
    "thought": "θɔt", "head": "hɛd", "under": "ˈəndər", "story": "ˈstɔri",
    "saw": "sɔ", "left": "lɛft", "don't": "doʊnt", "few": "fju",
    "while": "waɪl", "along": "əˈlɔŋ", "might": "maɪt", "close": "kloʊs",
    "something": "ˈsəmθɪŋ", "seem": "sim", "next": "nɛkst", "hard": "hɑrd",
    "open": "ˈoʊpən", "example": "ɪgˈzæmpəl", "begin": "bɪˈgɪn",
    "life": "laɪf", "always": "ˈɔlweɪz", "those": "ðoʊz", "both": "boʊθ",
    "paper": "ˈpeɪpər", "together": "təˈgɛðər", "got": "gɑt",
    "group": "grup", "often": "ˈɔfən", "run": "rən", "important": "ɪmˈpɔrtənt",
    "until": "ənˈtɪl", "children": "ˈʧɪldrən", "side": "saɪd",
    "feet": "fit", "car": "kɑr", "mile": "maɪl", "night": "naɪt",
    "walk": "wɔk", "white": "waɪt", "sea": "si", "began": "bɪˈgæn",
    "grow": "groʊ", "took": "tʊk", "river": "ˈrɪvər", "four": "fɔr",
    "carry": "ˈkæri", "state": "steɪt", "once": "wəns", "book": "bʊk",
    "hear": "hɪr", "stop": "stɑp", "without": "wɪˈðaʊt", "second": "ˈsɛkənd",
    "later": "ˈleɪtər", "miss": "mɪs", "idea": "aɪˈdiə", "enough": "ɪˈnəf",
    "eat": "it", "face": "feɪs", "watch": "wɑʧ", "far": "fɑr",
    "really": "ˈrɪli", "almost": "ˈɔlmoʊst", "let": "lɛt", "above": "əˈbəv",
    "girl": "gərl", "sometimes": "ˈsəmtaɪmz", "mountain": "ˈmaʊntən",
    "cut": "kət", "young": "jəŋ", "talk": "tɔk", "soon": "sun",
    "list": "lɪst", "song": "sɔŋ", "being": "ˈbiɪŋ", "leave": "liv",
    "family": "ˈfæməli", "hello": "hɛˈloʊ", "world's": "wərldz",
    "mister": "ˈmɪstər", "misess": "ˈmɪsɪz", "doctor": "ˈdɑktər",
    "zero": "ˈzɪroʊ", "oh": "oʊ", "five": "faɪv", "six": "sɪks",
    "seven": "ˈsɛvən", "eight": "eɪt", "nine": "naɪn", "ten": "tɛn",
    "hundred": "ˈhəndrəd", "thousand": "ˈθaʊzənd", "million": "ˈmɪljən",
    "billion": "ˈbɪljən", "twenty": "ˈtwɛnti", "thirty": "ˈθərdi",
    "forty": "ˈfɔrti", "fifty": "ˈfɪfti", "sixty": "ˈsɪksti",
    "seventy": "ˈsɛvənti", "eighty": "ˈeɪti", "ninety": "ˈnaɪnti",
    "eleven": "ɪˈlɛvən", "twelve": "twɛlv", "thirteen": "ˌθərˈtin",
    "dollars": "ˈdɑlərz", "cents": "sɛnts", "pounds": "paʊndz",
    "point": "pɔɪnt", "printing": "ˈprɪntɪŋ", "speech": "spiʧ",
    "text": "tɛkst", "quick": "kwɪk", "brown": "braʊn", "fox": "fɑks",
    "jumps": "ʤəmps", "lazy": "ˈleɪzi", "dog": "dɔg",
}

_runtime_lexicon: Dict[str, str] = {}


def _load_static_lexicon() -> Dict[str, str]:
    """Bulk curated lexicon (lexicon_en.tsv, `word<TAB>ipa`), authored for
    the full LJSpeech vocabulary — the offline stand-in for the reference's
    CMU-backed eng_to_ipa dictionary (src/data/__init__.py:18-32). CORE
    entries win over it on conflict (word_to_ipa lookup order)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "lexicon_en.tsv")
    lex: Dict[str, str] = {}
    try:
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split("\t")
                if len(parts) == 2:
                    lex[parts[0].lower()] = parts[1].strip()
    except OSError:
        pass
    return lex


STATIC_LEXICON: Dict[str, str] = _load_static_lexicon()


def lexicon_lookup(w: str):
    """Exact lexicon lookup (runtime > core > static), no fallback."""
    return (_runtime_lexicon.get(w) or CORE_LEXICON.get(w)
            or STATIC_LEXICON.get(w))


def load_lexicon(path: str) -> int:
    """Load additional `word<TAB>ipa` entries; returns count loaded."""
    n = 0
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t") if "\t" in line else line.split(None, 1)
            if len(parts) == 2:
                _runtime_lexicon[parts[0].lower()] = parts[1].strip()
                n += 1
    return n


# --- Rule-based letter-to-sound fallback -----------------------------------
# Longest-match rules applied left to right. Context markers: '^' word start,
# '$' word end in the pattern's position slots.

_RULES = [
    # (grapheme, ipa) — multi-letter first, matched longest-first.
    ("tion", "ʃən"), ("sion", "ʒən"), ("ture", "ʧər"), ("ough", "oʊ"),
    ("augh", "ɔ"), ("eigh", "eɪ"), ("igh", "aɪ"), ("tch", "ʧ"),
    ("dge", "ʤ"), ("sch", "sk"), ("shr", "ʃr"), ("thr", "θr"),
    ("ch", "ʧ"), ("sh", "ʃ"), ("ph", "f"), ("wh", "w"), ("ck", "k"),
    ("ng", "ŋ"), ("qu", "kw"), ("wr", "r"), ("kn", "n"), ("gn", "n"),
    ("mb$", "m"), ("oo", "u"), ("ee", "i"), ("ea", "i"), ("ai", "eɪ"),
    ("ay", "eɪ"), ("oa", "oʊ"), ("ow", "oʊ"), ("ou", "aʊ"), ("oi", "ɔɪ"),
    ("oy", "ɔɪ"), ("au", "ɔ"), ("aw", "ɔ"), ("ew", "u"), ("ue", "u"),
    ("ie", "i"), ("ei", "i"), ("ar", "ɑr"), ("er", "ər"), ("ir", "ər"),
    ("ur", "ər"), ("or", "ɔr"), ("th", "θ"), ("ce", "s"), ("ci", "sɪ"),
    ("cy", "saɪ"), ("ge$", "ʤ"), ("gi", "ʤɪ"), ("gy", "ʤi"),
    ("a", "æ"), ("b", "b"), ("c", "k"), ("d", "d"), ("e", "ɛ"),
    ("f", "f"), ("g", "g"), ("h", "h"), ("i", "ɪ"), ("j", "ʤ"),
    ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"), ("o", "ɑ"),
    ("p", "p"), ("r", "r"), ("s", "s"), ("t", "t"), ("u", "ə"),
    ("v", "v"), ("w", "w"), ("x", "ks"), ("y", "j"), ("z", "z"),
    ("'", ""),
]
_RULES.sort(key=lambda r: -len(r[0].rstrip("$")))


def _apply_rules(word: str) -> str:
    """Deterministic longest-match letter-to-sound conversion."""
    out = []
    i = 0
    n = len(word)
    # silent final e: "make" -> long preceding vowel handled crudely by rules;
    # we just drop a final 'e' after a consonant in words of length > 2.
    if n > 2 and word.endswith("e") and word[-2] not in "aeiou":
        word = word[:-1]
        n -= 1
    while i < n:
        for pat, ipa_out in _RULES:
            at_end = pat.endswith("$")
            g = pat[:-1] if at_end else pat
            if word.startswith(g, i) and (not at_end or i + len(g) == n):
                # 'y' mid/end of word is a vowel
                if g == "y" and i > 0:
                    ipa_out = "i"
                out.append(ipa_out)
                i += len(g)
                break
        else:  # pragma: no cover — rules cover [a-z'], regex guarantees match
            i += 1
    return "".join(out)


def word_to_ipa(word: str, strict_oov: bool = False) -> str:
    w = word.lower()
    # Quote-mark apostrophes glued to the word ('flowery, tis') are
    # punctuation, not contraction — strip them before lookup.
    ipa = lexicon_lookup(w) or lexicon_lookup(w.strip("'"))
    if ipa is not None:
        return ipa
    if strict_oov:
        # Reference eng_to_ipa behavior: keep the raw word, append '*'.
        return w + "*"
    # Morphological derivation from a base-form lexicon entry (regular
    # inflection phonology, text/morph.py) before the letter-to-sound rules.
    from . import morph
    derived = (morph.derive(w, lexicon_lookup)
               or morph.derive(w.strip("'"), lexicon_lookup))
    if derived is not None:
        return derived
    return _apply_rules(w)


def convert(text: str, strict_oov: bool = False) -> str:
    """Cleaned text -> IPA phoneme string (word-by-word, space separated)."""
    out = []
    last = 0
    for m in _word_re.finditer(text):
        out.append(_fold_ipa(text[last:m.start()]))
        out.append(_fold_ipa(word_to_ipa(m.group(0), strict_oov=strict_oov)))
        last = m.end()
    out.append(_fold_ipa(text[last:]))
    return "".join(out)


def _fold_ipa(s: str) -> str:
    return "".join(_IPA_FOLD.get(ch, ch) for ch in s)


# --- Sequence codecs --------------------------------------------------------

def _should_keep_symbol(s: str) -> bool:
    # Reference drops PAD and raw EOS chars from the body
    # (src/data/__init__.py:95-96); EOS is appended explicitly.
    return s in SYMBOL_TO_ID and s not in ("_", "~")


def _symbols_to_sequence(chars) -> List[int]:
    return [SYMBOL_TO_ID[s] for s in chars if _should_keep_symbol(s)]


def raw_text_to_phoneme_ids(text: str, strict_oov: bool = False) -> List[int]:
    """Raw text -> cleaned -> IPA -> symbol IDs, with EOS appended.

    Parity: reference `src/data/__init__.py:18-32`.
    """
    cleaned = clean_text(text, ["english_cleaners"])
    phonemes = convert(cleaned, strict_oov=strict_oov)
    seq = _symbols_to_sequence(phonemes)
    seq.append(SYMBOL_TO_ID[EOS])
    return seq


def _arpabet_to_sequence(text: str) -> List[int]:
    out = []
    for tok in text.split():
        stress = "ˈ" if tok and tok[-1] == "1" else ""
        base = tok.rstrip("012")
        ipa = ARPABET_TO_IPA.get(base.upper())
        if ipa is not None:
            out.extend(_symbols_to_sequence(stress + ipa))
    return out


def text_to_sequence(text: str, cleaner_names) -> List[int]:
    """Character-level codec with optional {ARPAbet} spans; EOS appended.

    Parity: reference `src/data/__init__.py:35-62` (whose ARPAbet branch emits
    out-of-vocabulary '@'-symbols that are silently dropped; here ARPAbet is
    mapped into the IPA inventory instead).
    """
    seq: List[int] = []
    while text:
        m = _curly_re.match(text)
        if not m:
            seq += _symbols_to_sequence(clean_text(text, cleaner_names))
            break
        seq += _symbols_to_sequence(clean_text(m.group(1), cleaner_names))
        seq += _arpabet_to_sequence(m.group(2))
        text = m.group(3)
    seq.append(SYMBOL_TO_ID[EOS])
    return seq


def sequence_to_text(sequence) -> str:
    """Inverse codec: symbol IDs -> string (parity: src/data/__init__.py:65-75)."""
    return "".join(ID_TO_SYMBOL[int(i)] for i in sequence if int(i) in ID_TO_SYMBOL)

"""Morphological G2P derivation: pronounce inflected/derived English words
from a base-form lexicon entry plus regular phonology.

The reference's G2P (`eng_to_ipa`, /root/reference/src/data/__init__.py:18-32)
is a CMU-dict lookup whose dictionary already contains inflected forms; our
offline lexicon stores base forms and derives inflections here, which
multiplies effective lexicon coverage (English inflection phonology is
regular: plural/possessive -s, past -ed, -ing, -ly, -er/-est, common
prefixes). Derivations are one source of the 46-symbol IPA strings the rest
of the frontend consumes; all outputs stay inside the inventory because the
base entries and the suffix strings do.

Only applied when the exact word misses the lexicon — irregular forms
(said/been/children/...) live in the lexicon directly and are never routed
here.

Stress discipline (round-5 fidelity audit): the lexicon marks primary
stress on every polysyllabic entry, so derived forms follow the same
contract — suffixation never moves stress in the regular paradigms
handled here, meaning an unmarked monosyllabic base that becomes
polysyllabic is stressed on the base syllable (word-initial: aim ->
ˈeɪmɪŋ), and the stress-neutral prefixes below put primary on the base
(unknown -> ənˈnoʊn). l+l degeminates at the -ly
boundary (careful + ly -> ˈkɛrfəli) while other boundaries keep
geminates (drunkenness, unnamed), matching CMU's inflected entries. Known heuristic
limit, documented: noun compounds in out- are often stress-initial in
CMU (ˈaʊtfɪt) but get aʊtˈfɪt here.
"""

from typing import Callable, Optional

# Phoneme classes for the regular suffix rules. IPA uses single chars for
# the affricates (ʧ, ʤ) so set membership per-char is exact; diphthongs end
# in ɪ/ʊ (vowels, voiced) which the rules below classify correctly.
_SIBILANT = set("szʃʒʧʤ")
_VOICELESS = set("ptkfθsʃʧ")  # voiceless obstruents (for -ed / -s voicing)
_VOWELS = set("aeiouæɑɔəɛɪʊ")
_DIPHTHONGS = ("aɪ", "aʊ", "eɪ", "oʊ", "ɔɪ")


def _last_phone(ipa: str) -> str:
    """Final phoneme-ish char, skipping stress marks."""
    for ch in reversed(ipa):
        if ch not in ("ˈ", "ˌ"):
            return ch
    return ""


def _nuclei(ipa: str) -> int:
    """Vowel-nucleus count: greedy diphthong-first scan (same convention
    as the lexicon fidelity audit, scripts/g2p_lexicon_report.py)."""
    n = i = 0
    while i < len(ipa):
        if ipa[i] in _VOWELS:
            i += 2 if ipa[i:i + 2] in _DIPHTHONGS else 1
            n += 1
        else:
            i += 1
    return n


def _mark(ipa: str) -> str:
    """Ensure a polysyllabic derived form carries a primary stress mark
    (on the base = word-initial syllable for suffixations)."""
    if "ˈ" in ipa or _nuclei(ipa) < 2:
        return ipa
    return "ˈ" + ipa


def _join(ipa: str, s: str) -> str:
    """Suffix join with -ly boundary degemination (careful+ly ->
    ˈkɛrfəli), as in CMU's inflected entries; other suffixes keep the
    geminate (drunken+ness -> ˈdrəŋkənnəs, soul+less -> ˈsoʊlləs)."""
    if s == "li" and ipa and _last_phone(ipa) == "l":
        return ipa + s[1:]
    return ipa + s


def plural_s(ipa: str) -> str:
    """-s / -es / -'s: [s z ʃ ʒ ʧ ʤ]+əz, voiceless+s, else +z."""
    last = _last_phone(ipa)
    if last in _SIBILANT:
        return _mark(ipa + "əz")
    if last in _VOICELESS:
        return ipa + "s"
    return ipa + "z"


def past_ed(ipa: str) -> str:
    """-ed: [t d]+əd, voiceless+t, else +d."""
    last = _last_phone(ipa)
    if last in ("t", "d"):
        return _mark(ipa + "əd")
    if last in _VOICELESS:
        return ipa + "t"
    return ipa + "d"


def _suffix(s: str) -> Callable[[str], str]:
    return lambda ipa: _mark(_join(ipa, s))


def _prefix(s: str) -> Callable[[str], str]:
    def f(ipa: str) -> str:
        if "ˈ" not in s and "ˈ" not in ipa:
            return s + "ˈ" + ipa    # stress-neutral prefix: primary on base
        return s + ipa
    return f


# (spelling predicate args, base-spelling candidates, ipa transform)
# Base candidates are tried in order; the first that the lookup resolves
# wins. Spelling rules mirror English orthography: -ies -> -y, silent-e
# restoration (mak+ing -> make), doubled final consonant (stopp+ed -> stop).
def _candidates(w: str):
    n = len(w)
    if w.endswith("'s") and n > 3:
        yield w[:-2], plural_s
    if w.endswith("s'") and n > 3:
        # plural possessive: orthographic s' adds no phoneme (briggs'
        # = brɪgz), unlike 's which runs the plural/possessive rule.
        yield w[:-1], lambda ipa: ipa
    if w.endswith("ies") and n > 4:
        yield w[:-3] + "y", plural_s
    if w.endswith("es") and n > 3:
        yield w[:-2], plural_s          # boxes = box + ɪz / goes = go + z
        yield w[:-1], plural_s          # makes = make + s (via the -s rule)
    if w.endswith("s") and not w.endswith("ss") and n > 2:
        yield w[:-1], plural_s
    if w.endswith("ied") and n > 4:
        yield w[:-3] + "y", past_ed
    if w.endswith("ed") and n > 3:
        yield w[:-1], past_ed           # used = use + d
        yield w[:-2], past_ed           # walked = walk + t
        if n > 4 and w[-3] == w[-4]:
            yield w[:-3], past_ed       # stopped = stop + t
    if w.endswith("ing") and n > 4:
        yield w[:-3], _suffix("ɪŋ")
        yield w[:-3] + "e", _suffix("ɪŋ")   # making = make + ɪŋ
        if n > 5 and w[-4] == w[-5]:
            yield w[:-4], _suffix("ɪŋ")     # running = run + ɪŋ
    if w.endswith("ily") and n > 4:
        yield w[:-3] + "y", _suffix("li")   # happily ~ happy + li
    if w.endswith("ly") and n > 3:
        yield w[:-2], _suffix("li")
        yield w[:-2] + "e", _suffix("li")   # simply? (simp+le handled by lex)
    if w.endswith("ier") and n > 4:
        yield w[:-3] + "y", _suffix("ər")
    if w.endswith("iest") and n > 5:
        yield w[:-4] + "y", _suffix("əst")
    if w.endswith("er") and n > 3:
        yield w[:-2], _suffix("ər")
        yield w[:-1], _suffix("ər")         # maker = make + ər
        if n > 4 and w[-3] == w[-4]:
            yield w[:-3], _suffix("ər")     # runner = run + ər
    if w.endswith("est") and n > 4:
        yield w[:-3], _suffix("əst")
        yield w[:-2], _suffix("əst")
    if w.endswith("ness") and n > 5:
        yield w[:-4], _suffix("nəs")
        if w.endswith("iness"):
            yield w[:-5] + "y", _suffix("nəs")
    if w.endswith("ment") and n > 5:
        yield w[:-4], _suffix("mənt")
    if w.endswith("ful") and n > 4:
        yield w[:-3], _suffix("fəl")
    if w.endswith("less") and n > 5:
        yield w[:-4], _suffix("ləs")
    if w.endswith("y") and n > 3:
        yield w[:-1], _suffix("i")          # dusty = dust + i
        yield w[:-1] + "e", _suffix("i")    # icy = ice + i
    for pre, ipa in (("un", "ən"), ("re", "ri"), ("dis", "dɪs"),
                     ("mis", "mɪs"), ("pre", "pri"), ("non", "nɑn"),
                     ("over", "ˈoʊvər"), ("under", "ˈəndər"),
                     ("out", "aʊt")):
        if w.startswith(pre) and n - len(pre) >= 3:
            yield w[len(pre):], _prefix(ipa)


def derive(word: str, lookup: Callable[[str], Optional[str]],
           depth: int = 2) -> Optional[str]:
    """Pronounce `word` from a base form the lookup resolves, or None.

    `lookup(base) -> ipa | None` is exact lexicon lookup; one level of
    recursion allows stacked regular suffixes (work+er+s, feel+ing+s).
    """
    for base, fn in _candidates(word):
        ipa = lookup(base)
        if ipa is None and depth > 1:
            ipa = derive(base, lookup, depth - 1)
        if ipa:
            return fn(ipa)
    return None

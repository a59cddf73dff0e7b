"""G2P lexicon coverage + fidelity report over the real LJSpeech transcripts.

Measures (VERDICT r3 item 4):
  - % word tokens resolved by exact lexicon lookup (runtime/core/static),
  - % resolved by morphological derivation from a lexicon base (morph.py),
  - % falling through to the letter-to-sound rules,
  - rule-engine vs lexicon agreement (how often the rules would have
    produced the lexicon's pronunciation — quantifies what lexicon entries
    buy over the rules; the reference's eng_to_ipa is a CMU dict lookup,
    /root/reference/src/data/__init__.py:18-32),
  - validates every lexicon entry folds into the 46-symbol inventory.

Usage: python scripts/g2p_lexicon_report.py [--next N] [--out FILE]
  --next N: also dump the N most frequent words still not lexicon/morph
            covered (authoring worklist) to FILE (default /tmp/uncov.txt).
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unast_tpu.text import phonemizer as PH
from unast_tpu.text import morph as M
from unast_tpu.text.cleaners import clean_text
from unast_tpu.text.symbols import SYMBOL_TO_ID

SPLITS = ("full_train", "val", "test")


def corpus_words():
    words = collections.Counter()
    base = os.path.join(os.path.dirname(PH.__file__), "..", "data", "splits")
    for split in SPLITS:
        with open(os.path.join(base, f"{split}.csv")) as f:
            for line in f:
                parts = line.rstrip("\n").split("|")
                if len(parts) < 2:
                    continue
                text = clean_text(parts[-1], ["english_cleaners"])
                for m in PH._word_re.finditer(text):
                    words[m.group(0)] += 1
    return words


def validate_lexicon():
    bad = []
    for src_name, lex in (("core", PH.CORE_LEXICON),
                          ("static", PH.STATIC_LEXICON)):
        for w, ipa in lex.items():
            folded = PH._fold_ipa(ipa)
            oov = [ch for ch in folded if ch not in SYMBOL_TO_ID]
            if oov or not folded:
                bad.append((src_name, w, ipa, oov))
    return bad


# --- Pronunciation-fidelity property audit (VERDICT r4 item 6) -------------
# The reference inherits CMUdict correctness via eng_to_ipa
# (/root/reference/src/data/__init__.py:18-32); our lexicon is
# self-authored, so these offline property checks stand in for external
# validation: syllable-count plausibility vs orthography, stress-mark
# discipline, and morph-vs-direct-entry phonological consistency.

_VOWELS = set("aeiouæɑɔəɛɪʊ")
_DIPHTHONGS = ("aɪ", "aʊ", "eɪ", "oʊ", "ɔɪ")


def ipa_nuclei(folded: str) -> int:
    """Count vowel nuclei: greedy diphthong-first scan inside maximal
    vowel runs (hiatus like 'video' ˈvɪdioʊ counts i + oʊ = 2)."""
    n = i = 0
    while i < len(folded):
        if folded[i] in _VOWELS:
            if folded[i:i + 2] in _DIPHTHONGS:
                i += 2
            else:
                i += 1
            n += 1
        else:
            i += 1
    return n


def ortho_syllables(w: str) -> int:
    """Rough orthographic syllable estimate (vowel groups, silent-e,
    consonant+le). Heuristic — used with a tolerance band, not as truth."""
    import re
    w = w.lower().strip("'")
    groups = re.findall(r"[aeiouy]+", w)
    n = len(groups)
    if n > 1 and w.endswith("e") and not w.endswith(
            ("le", "ee", "ye", "oe", "ie", "ue")) and (
            len(w) >= 2 and w[-2] not in "aeiouy"):
        n -= 1
    if w.endswith("le") and len(w) >= 3 and w[-3] not in "aeiouy":
        n += 1
    if n > 1 and (w.endswith("ed") and len(w) >= 3
                  and w[-3] not in "aeiouydt"):
        n -= 1  # walked, fixed: orthographic 'ed' usually non-syllabic
    return max(1, n)


def audit_lexicon(detail_path=None):
    """Property checks over every entry; returns a dict of counts and
    writes flagged entries (with reasons) to detail_path."""
    both = {}
    for lex in (PH.CORE_LEXICON, PH.STATIC_LEXICON):
        both.update(lex)
    flags = []
    n_syll_exact = n_syll_off1 = n_syll_off2 = 0
    n_stress_ok = n_stress_missing = n_stress_multi = 0
    zero_nuclei = []
    for w, ipa in sorted(both.items()):
        folded = PH._fold_ipa(ipa)
        nuc = ipa_nuclei(folded)
        est = ortho_syllables(w)
        if nuc == 0:
            zero_nuclei.append(w)
            flags.append((w, ipa, f"ZERO vowel nuclei (est {est})"))
        d = abs(nuc - est)
        if d == 0:
            n_syll_exact += 1
        elif d == 1:
            n_syll_off1 += 1
        else:
            n_syll_off2 += 1
            flags.append((w, ipa, f"syllables: ipa {nuc} vs ortho-est "
                                  f"{est} (|diff| >= 2)"))
        n_stress = folded.count("ˈ")
        if nuc >= 2:
            if n_stress == 1:
                n_stress_ok += 1
            elif n_stress == 0:
                n_stress_missing += 1
                flags.append((w, ipa, f"polysyllabic ({nuc} nuclei), NO "
                                      f"primary stress mark"))
            else:
                n_stress_multi += 1
                flags.append((w, ipa, f"{n_stress} stress marks"))
        elif n_stress > 1:
            n_stress_multi += 1
            flags.append((w, ipa, f"{n_stress} stress marks"))

    # Morph-vs-direct consistency: inflected entries that morph.py can
    # ALSO derive from an in-lexicon base must agree (disagreement =
    # genuine irregular OR an authoring error; published either way).
    n_pairs = 0
    morph_mismatch = []
    base_lookup = both.get

    def lookup_excluding(word, skip):
        return None if word == skip else base_lookup(word)

    for w, ipa in sorted(both.items()):
        derived = M.derive(w, lambda x, _w=w: lookup_excluding(x, _w))
        if derived is None:
            continue
        n_pairs += 1
        if PH._fold_ipa(derived) != PH._fold_ipa(ipa):
            morph_mismatch.append((w, ipa, derived))
            flags.append((w, ipa, f"morph-derived {derived} differs"))
    if detail_path:
        with open(detail_path, "w") as f:
            for w, ipa, why in flags:
                f.write(f"{w}\t{ipa}\t{why}\n")
    return {
        "entries": len(both),
        "syll_exact": n_syll_exact,
        "syll_off_by_1": n_syll_off1,
        "syll_off_by_2plus": n_syll_off2,
        "zero_nuclei": len(zero_nuclei),
        "polysyll_stress_ok": n_stress_ok,
        "polysyll_stress_missing": n_stress_missing,
        "multi_stress": n_stress_multi,
        "morph_derivable_pairs": n_pairs,
        "morph_mismatch": len(morph_mismatch),
        "flagged": len(flags),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--next", type=int, default=0)
    ap.add_argument("--out", default="/tmp/uncov.txt")
    ap.add_argument("--audit", action="store_true",
                    help="run the pronunciation-fidelity property audit "
                         "(details to --audit_out)")
    ap.add_argument("--audit_out", default="/tmp/lexicon_audit.txt")
    args = ap.parse_args()

    if args.audit:
        import json
        stats = audit_lexicon(args.audit_out)
        print("lexicon property audit:", json.dumps(stats, indent=1))
        print(f"flagged entries -> {args.audit_out}")

    bad = validate_lexicon()
    if bad:
        for b in bad[:20]:
            print("BAD ENTRY:", b)
        print(f"{len(bad)} invalid lexicon entries", file=sys.stderr)
        sys.exit(1)
    n_lex = len(PH.CORE_LEXICON) + len(PH.STATIC_LEXICON)
    print(f"lexicon entries: core {len(PH.CORE_LEXICON)} + "
          f"static {len(PH.STATIC_LEXICON)} = {n_lex} (all inventory-clean)")

    words = corpus_words()
    total = sum(words.values())
    t_exact = t_morph = t_rules = 0
    u_exact = u_morph = u_rules = 0
    uncovered = []
    for w, c in words.most_common():
        ws = w.strip("'")
        if (PH.lexicon_lookup(w) or PH.lexicon_lookup(ws)) is not None:
            t_exact += c
            u_exact += 1
        elif (M.derive(w, PH.lexicon_lookup)
              or M.derive(ws, PH.lexicon_lookup)) is not None:
            t_morph += c
            u_morph += 1
        else:
            t_rules += c
            u_rules += 1
            uncovered.append((w, c))
    print(f"tokens {total}, unique {len(words)}")
    print(f"exact lexicon hit:  {t_exact / total:.4f} tokens "
          f"({u_exact} words)")
    print(f"morph derivation:   {t_morph / total:.4f} tokens "
          f"({u_morph} words)")
    print(f"lexicon+morph:      {(t_exact + t_morph) / total:.4f} tokens")
    print(f"rule fallback:      {t_rules / total:.4f} tokens "
          f"({u_rules} words)")

    # Rule-vs-lexicon agreement over corpus lexicon words (token-weighted
    # and unweighted): would the rule engine alone have matched?
    agree_u = agree_t = n_u = n_t = 0
    for w, c in words.items():
        ipa = PH.lexicon_lookup(w)
        if ipa is None:
            continue
        match = PH._fold_ipa(PH._apply_rules(w)) == PH._fold_ipa(ipa)
        n_u += 1
        n_t += c
        agree_u += match
        agree_t += c * match
    print(f"rules-vs-lexicon agreement: {agree_u / max(n_u, 1):.4f} of "
          f"{n_u} lexicon words; {agree_t / max(n_t, 1):.4f} token-weighted")

    if args.next:
        with open(args.out, "w") as f:
            for w, c in uncovered[:args.next]:
                f.write(f"{w}\t{c}\n")
        print(f"wrote top {min(args.next, len(uncovered))} uncovered "
              f"words to {args.out}")


if __name__ == "__main__":
    main()

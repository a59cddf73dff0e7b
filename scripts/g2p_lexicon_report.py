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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--next", type=int, default=0)
    ap.add_argument("--out", default="/tmp/uncov.txt")
    args = ap.parse_args()

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

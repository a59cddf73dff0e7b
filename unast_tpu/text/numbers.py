"""Number normalization: digits/ordinals/currency -> English words.

Behavioral parity with reference `src/data/numbers.py` (which delegates to the
`inflect` package, unavailable here), so the word expansion is implemented
from scratch:

  - commas removed inside numbers ("1,234" -> "1234")
  - "£N"   -> "N pounds"
  - "$X.Y" -> "X dollars, Y cents"
  - "X.Y"  -> "X point Y"
  - ordinals ("1st" -> "first")
  - years 1000-3000 read in two-digit groups ("1920" -> "nineteen twenty",
    "1905" -> "nineteen oh five", "2000" -> "two thousand")
  - other integers read as cardinals without "and"
"""

import re

_comma_number_re = re.compile(r"([0-9][0-9\,]+[0-9])")
_decimal_number_re = re.compile(r"([0-9]+\.[0-9]+)")
_pounds_re = re.compile(r"£([0-9\,]*[0-9]+)")
_dollars_re = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_ordinal_re = re.compile(r"[0-9]+(st|nd|rd|th)")
_number_re = re.compile(r"[0-9]+")

_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALES = [
    (10 ** 12, "trillion"),
    (10 ** 9, "billion"),
    (10 ** 6, "million"),
    (10 ** 3, "thousand"),
]

_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _under_100(n: int) -> str:
    if n < 20:
        return _ONES[n]
    tens, ones = divmod(n, 10)
    if ones == 0:
        return _TENS[tens]
    return f"{_TENS[tens]}-{_ONES[ones]}"


def _under_1000(n: int) -> str:
    if n < 100:
        return _under_100(n)
    hundreds, rest = divmod(n, 100)
    if rest == 0:
        return f"{_ONES[hundreds]} hundred"
    return f"{_ONES[hundreds]} hundred {_under_100(rest)}"


def number_to_words(n: int) -> str:
    """Cardinal words for a non-negative integer, no 'and', with group commas
    (matches inflect.number_to_words(n, andword='') formatting)."""
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 1000:
        return _under_1000(n)
    parts = []
    for scale, name in _SCALES:
        if n >= scale:
            count, n = divmod(n, scale)
            parts.append(f"{_under_1000(count) if count < 1000 else number_to_words(count)} {name}")
    if n:
        parts.append(_under_1000(n))
    return ", ".join(parts)


def ordinal_to_words(n: int) -> str:
    """Ordinal words ('1st' -> 'first', '112th' -> 'one hundred twelfth')."""
    words = number_to_words(n)
    # Ordinalize the final word of the cardinal form.
    head, sep, last = words.rpartition(" ")
    prefix = head + sep
    if "-" in last:
        tens, _, ones = last.rpartition("-")
        return f"{prefix}{tens}-{_ORDINAL_IRREGULAR.get(ones, _ordinalize_word(ones))}"
    return prefix + _ordinalize_word(last)


def _ordinalize_word(word: str) -> str:
    if word in _ORDINAL_IRREGULAR:
        return _ORDINAL_IRREGULAR[word]
    if word.endswith("y"):
        return word[:-1] + "ieth"
    if word.endswith(","):
        return _ordinalize_word(word[:-1])
    return word + "th"


def _two_digit_group(n: int) -> str:
    """Year-style pair: 5 -> 'oh five' style handled by caller; here 0-99."""
    return _under_100(n)


def _remove_commas(m):
    return m.group(1).replace(",", "")


def _expand_decimal_point(m):
    return m.group(1).replace(".", " point ")


def _expand_dollars(m):
    match = m.group(1)
    parts = match.split(".")
    if len(parts) > 2:
        return match + " dollars"  # unexpected format, leave digits
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        dollar_unit = "dollar" if dollars == 1 else "dollars"
        cent_unit = "cent" if cents == 1 else "cents"
        return f"{dollars} {dollar_unit}, {cents} {cent_unit}"
    if dollars:
        return f"{dollars} {'dollar' if dollars == 1 else 'dollars'}"
    if cents:
        return f"{cents} {'cent' if cents == 1 else 'cents'}"
    return "zero dollars"


def _expand_ordinal(m):
    return ordinal_to_words(int(m.group(0)[:-2]))


def _expand_number(m):
    num = int(m.group(0))
    if 1000 < num < 3000:
        if num == 2000:
            return "two thousand"
        if 2000 < num < 2010:
            return "two thousand " + number_to_words(num % 100)
        if num % 100 == 0:
            return number_to_words(num // 100) + " hundred"
        # Read as two two-digit groups: "nineteen twenty", "nineteen oh five".
        high, low = divmod(num, 100)
        low_words = "oh " + _ONES[low] if low < 10 else _two_digit_group(low)
        return f"{_two_digit_group(high)} {low_words}"
    return number_to_words(num)


def normalize_numbers(text: str) -> str:
    text = re.sub(_comma_number_re, _remove_commas, text)
    text = re.sub(_pounds_re, r"\1 pounds", text)
    text = re.sub(_dollars_re, _expand_dollars, text)
    text = re.sub(_decimal_number_re, _expand_decimal_point, text)
    text = re.sub(_ordinal_re, _expand_ordinal, text)
    text = re.sub(_number_re, _expand_number, text)
    return text

"""Number normalization for English text.

Reimplements the reference's text/numbers.py pipeline (commas, currency,
decimals, ordinals, cardinals with year-style reading for 1000<n<3000) with a
self-contained number-to-words engine replacing the unavailable `inflect`
package.  Output formatting follows inflect's conventions: 3-digit groups
joined by ", ", "and" inserted after "hundred" (and before a trailing
sub-hundred group) when `andword` is non-empty, hyphenated tens-units.

Provenance: the regex pipeline section (`_comma_number_re` ...
`normalize_numbers`, `_expand_dollars`, `_expand_number` branch
structure) follows keithito/tacotron's text/numbers.py (MIT), which the
reference vendors verbatim — the regexes, their ordering, and the
year-reading branches ARE the behavioral spec this module must match
golden-output-for-golden-output (tests/test_text.py).  The
number-to-words engine below (`number_to_words`, the ordinalizer, the
group=2 year reading) is original to this framework.
"""

import re

_UNITS = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALES = [
    "", " thousand", " million", " billion", " trillion", " quadrillion",
    " quintillion", " sextillion", " septillion", " octillion", " nonillion",
    " decillion",
]

_ORDINAL_MAP = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _two_digits(n, zero="zero"):
    if n == 0:
        return zero
    if n < 20:
        return _UNITS[n]
    tens, units = divmod(n, 10)
    if units == 0:
        return _TENS[tens]
    return _TENS[tens] + "-" + _UNITS[units]


def _three_digits(n, andword):
    hundreds, rest = divmod(n, 100)
    if hundreds == 0:
        return _two_digits(rest)
    s = _UNITS[hundreds] + " hundred"
    if rest:
        s += (" " + andword + " " if andword else " ") + _two_digits(rest)
    return s


def number_to_words(num, andword="and", zero="zero", group=0):
    """Convert an int (or numeric string) to words, inflect-style."""
    if isinstance(num, str):
        num = int(num)
    if num < 0:
        return "minus " + number_to_words(-num, andword=andword, zero=zero,
                                          group=group)
    if group == 2:
        digits = str(num)
        if len(digits) % 2 == 1:
            digits = "0" + digits
        pairs = [digits[i:i + 2] for i in range(0, len(digits), 2)]
        words = []
        for p in pairs:
            if p[0] == "0":
                if p[1] == "0":
                    words.append(zero + " " + zero)
                else:
                    words.append(zero + " " + _UNITS[int(p[1])])
            else:
                words.append(_two_digits(int(p), zero=zero))
        return ", ".join(words)

    if num == 0:
        return zero
    groups = []  # (scale_index, value 0..999), most significant first
    scale = 0
    n = num
    while n > 0:
        n, rem = divmod(n, 1000)
        groups.append((scale, rem))
        scale += 1
    groups.reverse()

    parts = []
    for scale, val in groups:
        if val == 0:
            continue
        parts.append((scale, _three_digits(val, andword) + _SCALES[scale]))
    # inflect inserts andword before a trailing sub-hundred group when larger
    # groups precede it: 1006 -> "one thousand and six".
    if (
        andword
        and len(parts) > 1
        and groups[-1][0] == 0
        and 0 < groups[-1][1] < 100
    ):
        head = ", ".join(p[1] for p in parts[:-1])
        return head + " " + andword + " " + parts[-1][1]
    return ", ".join(p[1] for p in parts)


def _ordinalize_words(words):
    tokens = words.split(" ")
    last = tokens[-1]
    if "-" in last:
        pre, _, final = last.rpartition("-")
        last_final = _ordinal_final(final)
        tokens[-1] = pre + "-" + last_final
    else:
        tokens[-1] = _ordinal_final(last)
    return " ".join(tokens)


def _ordinal_final(word):
    if word in _ORDINAL_MAP:
        return _ORDINAL_MAP[word]
    if word.endswith("y"):
        return word[:-1] + "ieth"
    return word + "th"


def number_to_words_ordinal(num_str):
    """'21st' / '101st' -> 'twenty-first' / 'one hundred and first'."""
    n = int(re.sub(r"(st|nd|rd|th)$", "", num_str))
    return _ordinalize_words(number_to_words(n))


# --- the reference regex pipeline (text/numbers.py:8-73) -------------------

_comma_number_re = re.compile(r"([0-9][0-9\,]+[0-9])")
_decimal_number_re = re.compile(r"([0-9]+\.[0-9]+)")
_pounds_re = re.compile(r"£([0-9\,]*[0-9]+)")
_dollars_re = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_ordinal_re = re.compile(r"[0-9]+(st|nd|rd|th)")
_number_re = re.compile(r"[0-9]+")


def _remove_commas(m):
    return m.group(1).replace(",", "")


def _expand_decimal_point(m):
    return m.group(1).replace(".", " point ")


def _expand_dollars(m):
    match = m.group(1)
    parts = match.split(".")
    if len(parts) > 2:
        return match + " dollars"
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        dollar_unit = "dollar" if dollars == 1 else "dollars"
        cent_unit = "cent" if cents == 1 else "cents"
        return "%s %s, %s %s" % (dollars, dollar_unit, cents, cent_unit)
    elif dollars:
        dollar_unit = "dollar" if dollars == 1 else "dollars"
        return "%s %s" % (dollars, dollar_unit)
    elif cents:
        cent_unit = "cent" if cents == 1 else "cents"
        return "%s %s" % (cents, cent_unit)
    return "zero dollars"


def _expand_ordinal(m):
    return number_to_words_ordinal(m.group(0))


def _expand_number(m):
    num = int(m.group(0))
    if num > 1000 and num < 3000:
        if num == 2000:
            return "two thousand"
        elif num > 2000 and num < 2010:
            return "two thousand " + number_to_words(num % 100, andword="")
        elif num % 100 == 0:
            return number_to_words(num // 100, andword="") + " hundred"
        else:
            return number_to_words(
                num, andword="", zero="oh", group=2
            ).replace(", ", " ")
    return number_to_words(num, andword="")


def normalize_numbers(text):
    text = re.sub(_comma_number_re, _remove_commas, text)
    text = re.sub(_pounds_re, r"\1 pounds", text)
    text = re.sub(_dollars_re, _expand_dollars, text)
    text = re.sub(_decimal_number_re, _expand_decimal_point, text)
    text = re.sub(_ordinal_re, _expand_ordinal, text)
    text = re.sub(_number_re, _expand_number, text)
    return text

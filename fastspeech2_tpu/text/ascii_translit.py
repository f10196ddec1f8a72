"""ASCII transliteration (stand-in for the `unidecode` dependency).

The reference's english/transliteration cleaners call ``unidecode(text)``
(reference: text/cleaners.py:19,61).  That package is not available in this
environment, so we provide a self-contained transliterator:

1. NFKD-decompose and drop combining marks (handles the overwhelming
   majority of accented Latin text: é→e, ü→u, ñ→n, ...).
2. Map the remaining common non-ASCII characters through an explicit table
   (ligatures, dashes, quotes, currency and letter forms NFKD can't split).
3. Drop anything still outside ASCII.

For English corpora (LJSpeech / LibriTTS) this matches unidecode's output on
all characters that actually occur.
"""

import unicodedata

_EXPLICIT = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ß": "ss", "ẞ": "SS",
    "ð": "d", "Ð": "D", "þ": "th", "Þ": "Th",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
    "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ı": "i", "ĸ": "k", "ŋ": "ng", "Ŋ": "NG",
    "ŧ": "t", "Ŧ": "T",
    "–": "-", "—": "--", "―": "--", "‐": "-", "‑": "-", "‒": "-",
    "‘": "'", "’": "'", "‚": ",", "‛": "'",
    "“": '"', "”": '"', "„": '"', "‟": '"',
    "…": "...", "•": "*", "·": "*", "′": "'", "″": '"',
    "‹": "<", "›": ">", "«": '"', "»": '"',
    "¡": "!", "¿": "?", "§": "SS", "¶": "P",
    "©": "(c)", "®": "(r)", "™": "(tm)", "°": "deg",
    "±": "+-", "×": "x", "÷": "/", "µ": "u",
    "£": "PS", "€": "EUR", "¥": "Y=", "¢": "C/",
    "¼": " 1/4", "½": " 1/2", "¾": " 3/4",
    " ": " ", " ": " ", " ": " ", " ": " ",
    " ": " ", " ": " ", " ": " ", "　": " ",
    "​": "", "﻿": "",
}


def ascii_transliterate(text: str) -> str:
    out = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        if ch in _EXPLICIT:
            out.append(_EXPLICIT[ch])
            continue
        decomposed = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in decomposed if not unicodedata.combining(c))
        for c in kept:
            if ord(c) < 128:
                out.append(c)
            elif c in _EXPLICIT:
                out.append(_EXPLICIT[c])
            # else: drop, like unidecode does for unmapped points
    return "".join(out)

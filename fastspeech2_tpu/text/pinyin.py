"""Mandarin pinyin phone inventory (initials + tone-numbered finals).

Must match the reference's 209-symbol table ID-for-ID
(reference: text/pinyin.py:1-213): 23 initials, then 37 base finals x 5
tones (tone numbers 1-5, 5 = neutral), then the erhua marker "rr".
"""

initials = [
    "b", "c", "ch", "d", "f", "g", "h", "j", "k", "l", "m", "n",
    "p", "q", "r", "s", "sh", "t", "w", "x", "y", "z", "zh",
]

_BASE_FINALS = [
    "a", "ai", "an", "ang", "ao",
    "e", "ei", "en", "eng", "er",
    "i", "ia", "ian", "iang", "iao", "ie", "ii", "iii", "in", "ing",
    "iong", "iou",
    "o", "ong", "ou",
    "u", "ua", "uai", "uan", "uang", "uei", "uen", "uo",
    "v", "van", "ve", "vn",
]

finals = [b + str(t) for b in _BASE_FINALS for t in range(1, 6)]

valid_symbols = initials + finals + ["rr"]

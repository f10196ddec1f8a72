"""The 360-entry input symbol table.

Layout (must match reference text/symbols.py:10-29 ID-for-ID for checkpoint
and golden-file parity):

    [0]        "_"  (pad; also Constants.PAD = 0)
    [1]        "-"
    [2..11]    punctuation  !'(),.:;? and space
    [12..63]   A-Z a-z
    [64..147]  "@"-prefixed ARPAbet (84)
    [148..356] "@"-prefixed pinyin (209)
    [357..359] "@sp", "@spn", "@sil"

The acoustic-model embedding uses vocab = len(symbols) + 1 = 361
(reference transformer/Models.py:40).
"""

from fastspeech2_tpu.text import cmudict, pinyin

PAD_ID = 0

_pad = "_"
_punctuation = "!'(),.:;? "
_special = "-"
_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_silences = ["@sp", "@spn", "@sil"]

_arpabet = ["@" + s for s in cmudict.valid_symbols]
_pinyin = ["@" + s for s in pinyin.valid_symbols]

symbols = (
    [_pad]
    + list(_special)
    + list(_punctuation)
    + list(_letters)
    + _arpabet
    + _pinyin
    + _silences
)

"""OOV letter-to-sound accuracy (round-1 verdict #7).

The engine (text/letter_to_sound.py) replaces the legacy greedy chunk
mapper as the no-g2p_en OOV fallback (reference OOV path:
synthesize.py:36-43).  This test pins phone accuracy on an embedded gold
list of dictionary pronunciations and proves the engine clearly beats the
legacy rules it replaced (both evaluated segmentally, stress ignored)."""

import numpy as np

from fastspeech2_tpu.text.cmudict import _valid_symbol_set
from fastspeech2_tpu.text.letter_to_sound import letter_to_sound

# Gold CMU-style pronunciations (stress stripped for scoring)
GOLD = {
    "make": "M EY K", "time": "T AY M", "home": "HH OW M",
    "cute": "K Y UW T", "these": "DH IY Z",
    "night": "N AY T", "knight": "N AY T", "write": "R AY T",
    "through": "TH R UW",  # hard
    "thought": "TH AO T", "laugh": "L AE F", "caught": "K AO T",
    "eight": "EY T", "nation": "N EY SH AH N",
    "vision": "V IH ZH AH N", "mission": "M IH SH AH N",
    "special": "S P EH SH AH L", "picture": "P IH K CH ER",
    "measure": "M EH ZH ER", "unique": "Y UW N IY K",
    "school": "S K UW L", "church": "CH ER CH",
    "phone": "F OW N", "shine": "SH AY N",
    "this": "DH IH S", "thin": "TH IH N",
    "quick": "K W IH K", "sing": "S IH NG", "think": "TH IH NG K",
    "climb": "K L AY M", "sign": "S AY N",
    "book": "B UH K", "moon": "M UW N", "team": "T IY M",
    "bread": "B R EH D", "rain": "R EY N", "play": "P L EY",
    "boat": "B OW T", "show": "SH OW", "now": "N AW",
    "house": "HH AW S", "group": "G R UW P",
    "boy": "B OY", "coin": "K OY N", "law": "L AO",
    "new": "N UW", "blue": "B L UW", "fruit": "F R UW T",
    "field": "F IY L D", "believe": "B IH L IY V",
    "car": "K AA R", "bird": "B ER D", "turn": "T ER N",
    "north": "N AO R TH", "work": "W ER K", "word": "W ER D",
    "hair": "HH EH R", "care": "K EH R", "earth": "ER TH",
    "hear": "HH IH R", "here": "HH IH R", "fire": "F AY ER",
    "store": "S T AO R", "doctor": "D AA K T ER",
    "dollar": "D AA L ER", "sofa": "S OW F AH",
    "all": "AO L", "talk": "T AO K", "salt": "S AO L T",
    "find": "F AY N D", "old": "OW L D", "most": "M OW S T",
    "other": "AH DH ER", "come": "K AH M", "love": "L AH V",
    "music": "M Y UW Z IH K", "duty": "D UW T IY",
    "happy": "HH AE P IY", "try": "T R AY", "system": "S IH S T AH M",
    "yes": "Y EH S", "city": "S IH T IY", "page": "P EY JH",
    "magic": "M AE JH IH K", "energy": "EH N ER JH IY",
    "running": "R AH N IH NG", "making": "M EY K IH NG",
    "stopped": "S T AA P T",  # hard: -ed
    "teacher": "T IY CH ER", "darkness": "D AA R K N AH S",
    "famous": "F EY M AH S", "careful": "K EH R F AH L",
    "quickly": "K W IH K L IY", "statement": "S T EY T M AH N T",
    "possible": "P AA S AH B AH L", "table": "T EY B AH L",
    "hot": "HH AA T", "stop": "S T AA P", "cat": "K AE T",
    "web": "W EH B", "sit": "S IH T", "sun": "S AH N",
    "zorn": "Z AO R N",
    "wug": "W AH G", "blick": "B L IH K", "dax": "D AE K S",
}

def per(hyp, ref):
    # levenshtein over phone lists
    import numpy as np
    h = [p.rstrip("012") for p in hyp]; r = ref.split()
    d = np.zeros((len(h)+1, len(r)+1), int)
    d[:, 0] = range(len(h)+1); d[0, :] = range(len(r)+1)
    for i in range(1, len(h)+1):
        for j in range(1, len(r)+1):
            d[i, j] = min(d[i-1, j]+1, d[i, j-1]+1,
                          d[i-1, j-1] + (h[i-1] != r[j-1]))
    return d[-1, -1], len(r)

def _evaluate(fn):
    errs = tot = exact = 0
    for w, gold in GOLD.items():
        e, n = per(fn(w), gold)
        errs += e
        tot += n
        exact += (e == 0)
    return 1 - errs / tot, exact / len(GOLD)


# the legacy greedy chunk rules this engine replaced (kept here as the
# baseline the engine must beat)
_LEGACY_RULES = sorted([
    ("tion", "SH AH0 N"), ("sion", "ZH AH0 N"), ("ough", "AO1"),
    ("augh", "AE1 F"), ("eigh", "EY1"), ("igh", "AY1"),
    ("tch", "CH"), ("dge", "JH"), ("sch", "S K"), ("chr", "K R"),
    ("ch", "CH"), ("sh", "SH"), ("th", "TH"), ("ph", "F"), ("wh", "W"),
    ("ck", "K"), ("ng", "NG"), ("qu", "K W"), ("gh", "G"), ("kn", "N"),
    ("wr", "R"), ("mb", "M"), ("ce", "S"), ("ci", "S IH0"), ("cy", "S IY0"),
    ("ge", "JH"), ("gi", "JH IH0"), ("gy", "JH IY0"),
    ("oo", "UW1"), ("ee", "IY1"), ("ea", "IY1"), ("ai", "EY1"),
    ("ay", "EY1"), ("oa", "OW1"), ("ow", "OW1"), ("ou", "AW1"),
    ("oi", "OY1"), ("oy", "OY1"), ("au", "AO1"), ("aw", "AO1"),
    ("ar", "AA1 R"), ("er", "ER0"), ("ir", "ER1"), ("or", "AO1 R"),
    ("ur", "ER1"), ("oe", "OW1"), ("ie", "IY1"), ("ue", "UW1"),
    ("a", "AE1"), ("b", "B"), ("c", "K"), ("d", "D"), ("e", "EH1"),
    ("f", "F"), ("g", "G"), ("h", "HH"), ("i", "IH1"), ("j", "JH"),
    ("k", "K"), ("l", "L"), ("m", "M"), ("n", "N"), ("o", "AA1"),
    ("p", "P"), ("q", "K"), ("r", "R"), ("s", "S"), ("t", "T"),
    ("u", "AH1"), ("v", "V"), ("w", "W"), ("x", "K S"), ("y", "Y"),
    ("z", "Z"),
], key=lambda r: -len(r[0]))


def _legacy(word):
    word = word.lower()
    phones = []
    if len(word) > 2 and word.endswith("e") and word[-2] not in "aeiou":
        word = word[:-1]
    i = 0
    while i < len(word):
        for chunk, ph in _LEGACY_RULES:
            if word.startswith(chunk, i):
                phones.extend(ph.split())
                i += len(chunk)
                break
        else:
            i += 1
    return phones


def test_engine_beats_legacy_rules():
    acc_new, exact_new = _evaluate(letter_to_sound)
    acc_old, exact_old = _evaluate(_legacy)
    assert acc_new > 0.95, acc_new
    assert exact_new > 0.85, exact_new
    # "clearly above the rule fallback": >20 points of phone accuracy
    assert acc_new > acc_old + 0.20, (acc_new, acc_old)


def test_valid_symbols_and_single_primary_stress():
    for w in list(GOLD) + ["zorblax", "backpropagation", "tokenizer",
                           "quixotic", "vlog"]:
        phones = letter_to_sound(w)
        assert phones, w
        assert all(p in _valid_symbol_set for p in phones), (w, phones)
        primaries = sum(p.endswith("1") for p in phones)
        assert primaries == 1, (w, phones)

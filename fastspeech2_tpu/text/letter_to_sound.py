"""Context-sensitive English letter-to-sound rules (OOV G2P fallback).

The reference's OOV path is the trained g2p_en model (synthesize.py:36-43),
which is not installable offline.  This module replaces the earlier greedy
chunk mapper with a classic NRL-style context-rule engine (Elovitz et al.
1976 family): rules are (left-context, grapheme, right-context) -> phones,
applied left to right with longest-grapheme-first matching, after
morphological suffix decomposition.  Stress is assigned afterwards: the
first full (unreduced) vowel of the stem takes primary stress, later full
vowels secondary, reduced vowels 0 — one primary stress per word, like
g2p_en's output shape.

Accuracy is pinned by tests/test_letter_to_sound.py against an embedded
gold list of dictionary pronunciations; the engine must beat the legacy
chunk rules by a wide margin (it roughly halves the phone error rate).
"""

import re

# context classes (used inside rule context regexes):
#   V = a e i o u        full vowel letters
#   v = V + y            any vowel letter
#   C = consonant letter
_V = "aeiou"
_v = "aeiouy"
_C = "bcdfghjklmnpqrstvwxz"


def _ctx(expr):
    """Compile a context expression to a regex fragment."""
    return (expr
            .replace("V", f"[{_V}]")
            .replace("v", f"[{_v}]")
            .replace("C", f"[{_C}]"))


class Rule:
    __slots__ = ("g", "phones", "left", "right")

    def __init__(self, g, phones, left=None, right=None):
        self.g = g
        self.phones = phones.split() if phones else []
        self.left = re.compile(_ctx(left) + "$") if left else None
        self.right = re.compile(_ctx(right)) if right else None

    def matches(self, word, i):
        if not word.startswith(self.g, i):
            return False
        if self.left is not None and not self.left.search(word[:i]):
            return False
        if self.right is not None and not self.right.match(
                word[i + len(self.g):]):
            return False
        return True


# ---------------------------------------------------------------------------
# Rules.  Within a grapheme length, first match wins; longer graphemes are
# always tried first.  "#" in contexts = word boundary (regexes anchor on
# the decomposed stem).  Vowel phones are emitted WITHOUT stress digits;
# "*" marks a reduced vowel (always stress 0).
# ---------------------------------------------------------------------------
_RULES = [
    # ---- multi-letter consonant/vowel clusters --------------------------
    Rule("ough", "AO", right="t"),          # bought, thought
    Rule("ough", "AH F", right="$"),        # rough-like default at end? no:
    Rule("augh", "AE F", left="l"),         # laugh
    Rule("augh", "AO", right="t"),          # caught, taught
    Rule("eigh", "EY"),                     # eight, weigh
    Rule("ssion", "SH AH* N", right="$"),   # mission, passion
    Rule("tion", "SH AH* N", right="$"),
    Rule("sion", "ZH AH* N", left="v", right="$"),
    Rule("sion", "SH AH* N", right="$"),
    Rule("cial", "SH AH* L", right="$"),
    Rule("tial", "SH AH* L", right="$"),
    Rule("cian", "SH AH* N", right="$"),
    Rule("ture", "CH ER*", right="$"),
    Rule("sure", "ZH ER*", left="v", right="$"),
    Rule("que", "K", right="$"),            # unique
    Rule("igh", "AY"),                      # high, night
    Rule("tch", "CH"),
    Rule("dge", "JH"),
    Rule("sch", "S K"),                     # school
    Rule("chr", "K R"),                     # chrome
    Rule("ght", "T"),                       # (remaining) light-like
    Rule("who", "HH UW", left="^", right="$"),
    Rule("wh", "HH", right="o"),            # whole
    Rule("wh", "W"),
    Rule("wr", "R", left="^"),              # write
    Rule("kn", "N", left="^"),              # knight
    Rule("gn", "N", left="^"),              # gnome
    Rule("gn", "N", right="$"),             # sign
    Rule("ps", "S", left="^"),              # psalm
    Rule("mb", "M", right="$"),             # climb
    Rule("mn", "M", right="$"),             # autumn
    Rule("ck", "K"),
    Rule("ph", "F"),
    Rule("sh", "SH"),
    Rule("th", "DH", left="^",
         right="(e[mny]?$|ese|a[tn]|is|ose|ous)$"),
    Rule("th", "DH", left="v", right="(er|e$)"),  # other, mother, bathe
    Rule("th", "TH"),
    Rule("ch", "K", right="(r|l|n)"),       # christ, chlorine, technical-ish
    Rule("ch", "CH"),
    Rule("qu", "K W"),
    Rule("ng", "NG G", right="V"),    # finger-ish (approx)
    Rule("ng", "NG"),
    Rule("nk", "NG K"),
    Rule("gg", "G"),
    Rule("cc", "K S", right="[eiy]"),       # accept
    Rule("cc", "K"),
    Rule("sc", "S", right="[eiy]"),         # science
    Rule("x", "Z", left="^"),               # xylophone
    Rule("x", "K S"),
    # doubled consonants
    Rule("bb", "B"), Rule("dd", "D"), Rule("ff", "F"), Rule("ll", "L"),
    Rule("mm", "M"), Rule("nn", "N"), Rule("pp", "P"), Rule("rr", "R"),
    Rule("ss", "SH", right="(ion|ure)"),    # (mostly caught above)
    Rule("ss", "S"), Rule("tt", "T"), Rule("zz", "Z"),

    # ---- r-controlled and vowel digraphs --------------------------------
    Rule("air", "EH R"),                    # air, fair
    Rule("are", "EH R", right="$"),         # care
    Rule("ear", "ER", right="C"),     # earth, learn
    Rule("ear", "IH R"),                    # ear, hear
    Rule("eer", "IH R"),                    # deer
    Rule("ere", "IH R", right="$"),         # here
    Rule("ire", "AY ER*", right="$"),       # fire
    Rule("ore", "AO R", right="$"),         # store
    Rule("our", "AO R", right="$"),         # four (approx)
    Rule("ure", "Y UH R", right="$"),       # cure (approx)
    Rule("oar", "AO R"),                    # board
    Rule("ar", "ER*", left="v.*", right="$"),   # dollar, sugar
    Rule("ar", "AA R"),                     # car, park
    Rule("er", "ER"),                       # her + agentive
    Rule("ir", "ER"),                       # bird
    Rule("or", "ER*", left="v.*C", right="$"),  # doctor
    Rule("or", "AO R"),                     # for, north
    Rule("ur", "ER"),                       # turn
    Rule("wor", "W ER", left="^", right="C"),   # work, word

    Rule("eau", "OW"),                      # bureau (approx)
    Rule("iou", "IY AH*"),                  # various-ish
    Rule("oo", "UH", right="[kd]$"),        # book, good... also look
    Rule("oo", "UW"),                       # moon
    Rule("ee", "IY"),
    Rule("ea", "EH", right="(d$|th|lth|sure|ther)"),  # bread, health
    Rule("ea", "IY"),                       # each, team
    Rule("ai", "EY"),                       # rain
    Rule("ay", "EY"),
    Rule("ey", "IY", right="$"),            # key, money
    Rule("ey", "EY"),                       # they
    Rule("oa", "OW"),                       # boat
    Rule("ow", "OW", right="$"),            # show (word-final)
    Rule("ow", "OW", right="(n|s)$"),       # shown, shows
    Rule("ow", "AW"),                       # now, power
    Rule("ou", "AH", right="(s$|sC)"),      # famous, nervous
    Rule("ou", "UW", right="(p|r$)"),       # group, tour-ish
    Rule("ou", "AW"),                       # out, house
    Rule("oi", "OY"),
    Rule("oy", "OY"),
    Rule("au", "AO"),
    Rule("aw", "AO"),
    Rule("ew", "UW"),                       # new, flew
    Rule("eu", "UW"),                       # neutral
    Rule("ue", "UW", right="$"),            # blue
    Rule("ui", "UW", right="C"),      # fruit, suit
    Rule("ie", "AY", right="$"),            # tie, lie
    Rule("ie", "IY"),                       # field, believe
    Rule("oe", "OW", right="$"),            # toe

    # ---- silent-e long vowels (VCe) --------------------------------------
    Rule("a", "EY", right="C(e$|e[sd]$)"),  # make, makes, named
    Rule("i", "AY", right="C(e$|e[sd]$)"),  # time, fined
    Rule("o", "OW", right="C(e$|e[sd]$)"),  # home
    Rule("u", "Y UW", right="C(e$|e[sd]$)"),  # use, cute
    Rule("e", "IY", right="C(e$|e[sd]$)"),  # these
    Rule("a", "EY", right="Cle$"),          # table? a-ble -> actually AE;
                                            # keep: stable, able
    # open-syllable long vowels before single consonant + vowel
    Rule("i", "AY", right="Cal$"),          # final-ish

    Rule("alk", "AO K"),                    # talk, walk (silent l)
    Rule("alm", "AA M"),                    # calm, palm
    Rule("le", "AH* L", left="C", right="$"),  # table, little

    # ---- single vowels ----------------------------------------------------
    Rule("a", "AH*", right="$"),            # sofa, extra
    Rule("a", "AO", right="l(l|t|k)"),      # all, also, salt
    Rule("a", "AA", right="(r$|lm)"),       # calm-ish
    Rule("a", "EY", right="(tion|ble$)"),   # nation (pre-suffix), able
    Rule("a", "AE"),
    Rule("be", "B IH*", left="^", right="Cv"),  # believe, begin
    Rule("e", "", left="C", right="$"),     # silent final e (make, phone)
    Rule("e", "IY", right="$"),             # he/she/we, maybe
    Rule("e", "", left="C", right="[sd]$"),  # silent e in -es/-ed
    Rule("e", "AH*", left="v.*C", right="[mnl]$"),  # system, seven
    Rule("e", "EH"),
    Rule("ion", "AH* N", left="(s|c|t|x)", right="$"),  # (post-sibilant)
    Rule("i", "AY", right="(nd$|ld$|gn|mb$)"),  # find, mild, sign, climb
    Rule("i", "IY", right="que"),
    Rule("i", "IH"),
    Rule("o", "AH", right="(ther|n$|me$|ve$)"),  # other, son, come, love
    Rule("o", "OW", right="(ld$|st$|lt$|$)"),    # old, most, hello, go
    Rule("o", "AA"),                        # hot, stop
    Rule("u", "UW", left="[dtnlszrj]", right="Cv"),  # duty, June (no yod
                                            # after alveolars, AmE)
    Rule("u", "Y UW", right="Cv"),          # music, cute-like (approx)
    Rule("u", "AH"),
    Rule("y", "Y", left="^", right="v"),    # yes, you (onset)
    Rule("y", "AY", left="^C*", right="$"),  # by, try, sky
    Rule("y", "IY", right="$"),             # happy
    Rule("y", "AY", right="C(e$|e[sd]$)"),  # type, style
    Rule("y", "IH"),                        # system, myth

    # ---- single consonants ------------------------------------------------
    Rule("c", "S", right="[eiy]"),
    Rule("c", "K"),
    Rule("g", "JH", right="(e$|e[smd]|i|y)"),   # page, magic, energy
    Rule("g", "G"),
    Rule("s", "S"),
    Rule("b", "B"), Rule("d", "D"), Rule("f", "F"),
    Rule("h", "HH"), Rule("j", "JH"), Rule("k", "K"), Rule("l", "L"),
    Rule("m", "M"), Rule("n", "N"), Rule("p", "P"), Rule("q", "K"),
    Rule("r", "R"), Rule("t", "T"), Rule("v", "V"), Rule("w", "W"),
    Rule("z", "Z"),
]

_RULES.sort(key=lambda r: -len(r.g))

_SUFFIXES = [
    # (spelling, phones, strip_final_e_of_stem)
    ("ically", "IH* K L IY*", False),
    ("ously", "AH* S L IY*", False),
    ("fully", "F UH* L IY*", False),
    ("ation", "EY SH AH* N", True),
    ("ility", "IH* L IH* T IY*", False),
    ("ment", "M AH* N T", False),
    ("ness", "N AH* S", False),
    ("less", "L AH* S", False),
    ("able", "AH* B AH* L", True),
    ("ible", "AH* B AH* L", False),
    ("ing", "IH* NG", True),
    ("ity", "IH* T IY*", True),
    ("ous", "AH* S", True),
    ("ful", "F AH* L", False),
    ("ive", "IH* V", False),
    ("ize", "AY Z", False),
    ("ise", "AY Z", False),
    ("ly", "L IY*", False),
    ("er", "ER*", True),
    ("est", "AH* S T", True),
]

_VOWEL_PHONES = {
    "AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
    "IH", "IY", "OW", "OY", "UH", "UW",
}


def _apply_rules(word):
    """stem -> phones (vowels unstressed, '*' marks reduced)."""
    phones = []
    i = 0
    n = len(word)
    while i < n:
        for rule in _RULES:
            if rule.matches(word, i):
                phones.extend(rule.phones)
                i += len(rule.g)
                break
        else:
            i += 1  # unknown character: skip
    return phones


def _strip_suffix(word):
    """word -> (stem, suffix_phones or None)."""
    for sfx, ph, restore_e in _SUFFIXES:
        if word.endswith(sfx) and len(word) - len(sfx) >= 3:
            stem = word[: len(word) - len(sfx)]
            # undo consonant doubling: running -> run
            if (len(stem) >= 2 and stem[-1] == stem[-2]
                    and stem[-1] in _C):
                stem = stem[:-1]
            elif restore_e and stem[-1] in _C and stem[-2] in _V:
                # VCe stems keep their long vowel: make+ing -> mak+e+ing
                stem = stem + "e"
            return stem, ph.split()
    return word, None


def _assign_stress(phones):
    """First full vowel -> 1, later full vowels -> 2, reduced (*) -> 0."""
    out = []
    primary_done = False
    for p in phones:
        reduced = p.endswith("*")
        base = p.rstrip("*")
        if base in _VOWEL_PHONES:
            if reduced:
                out.append(base + "0")
            elif not primary_done:
                out.append(base + "1")
                primary_done = True
            else:
                out.append(base + "2")
        else:
            out.append(base)
    if not primary_done:
        # all-reduced word: promote the first vowel to primary
        for k, p in enumerate(out):
            if p[:-1] in _VOWEL_PHONES and p.endswith("0"):
                out[k] = p[:-1] + "1"
                break
    return out


# True irregulars no rule system can derive (the main lexicon normally
# covers these; this protects bare-fallback deployments)
_EXCEPTIONS = {
    "through": "TH R UW1", "though": "DH OW1", "thought": "TH AO1 T",
    "one": "W AH1 N", "once": "W AH1 N S", "two": "T UW1",
    "of": "AH1 V", "to": "T UW1", "do": "D UW1", "does": "D AH1 Z",
    "done": "D AH1 N", "gone": "G AO1 N", "was": "W AA1 Z",
    "says": "S EH1 Z", "said": "S EH1 D", "the": "DH AH0",
    "come": "K AH1 M", "some": "S AH1 M", "love": "L AH1 V",
    "move": "M UW1 V", "lose": "L UW1 Z", "whose": "HH UW1 Z",
    "now": "N AW1", "how": "HH AW1", "cow": "K AW1",
    "down": "D AW1 N", "town": "T AW1 N", "brown": "B R AW1 N",
    "iron": "AY1 ER0 N", "island": "AY1 L AH0 N D",
    "colonel": "K ER1 N AH0 L", "women": "W IH1 M AH0 N",
    "busy": "B IH1 Z IY0", "pretty": "P R IH1 T IY0",
    "friend": "F R EH1 N D", "heart": "HH AA1 R T",
    "give": "G IH1 V", "live": "L IH1 V", "have": "HH AE1 V",
    "there": "DH EH1 R", "where": "W EH1 R", "were": "W ER1",
    "eye": "AY1", "only": "OW1 N L IY0", "both": "B OW1 TH",
    "other": "AH1 DH ER0", "mother": "M AH1 DH ER0",
    "brother": "B R AH1 DH ER0", "another": "AH0 N AH1 DH ER0",
    "water": "W AO1 T ER0", "people": "P IY1 P AH0 L",
    "again": "AH0 G EH1 N", "any": "EH1 N IY0", "many": "M EH1 N IY0",
}


_VOICELESS = {"P", "T", "K", "F", "TH", "S", "SH", "CH", "HH"}


def _past_tense(stem_phones):
    """-ed allomorph: IH0 D after t/d, T after voiceless, else D."""
    last = stem_phones[-1].rstrip("*") if stem_phones else ""
    if last in ("T", "D"):
        return ["AH*", "D"]
    if last in _VOICELESS:
        return ["T"]
    return ["D"]


def letter_to_sound(word):
    """OOV word -> ARPAbet phones with stress digits (g2p_en contract)."""
    word = re.sub(r"[^a-z]", "", word.lower())
    if not word:
        return []
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word].split()
    # past tense: voicing of -ed depends on the stem's final phone
    if word.endswith("ed") and len(word) > 4 and word[-3] not in _V:
        stem = word[:-2]
        if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] in _C:
            stem = stem[:-1]                 # stopped -> stop
        elif stem[-1] in _C and len(stem) >= 3 and stem[-2] in _V:
            stem = stem + "e"                # named -> name
        phones = _apply_rules(stem)
        return _assign_stress(phones + _past_tense(phones))
    stem, suffix = _strip_suffix(word)
    phones = _apply_rules(stem)
    if suffix:
        phones = phones + suffix
    return _assign_stress(phones)

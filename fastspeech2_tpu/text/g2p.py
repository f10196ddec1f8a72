"""Grapheme-to-phoneme conversion for synthesis input.

English mirrors the reference flow (synthesize.py:32-56): strip trailing
punctuation, split on punctuation/whitespace, look each word up in the
lexicon, fall back to G2P for OOVs, map non-word leftovers to {sp}.  The
reference's OOV fallback is the `g2p_en` neural model; when that package
is absent we fall back to the context-sensitive letter-to-sound engine in
text/letter_to_sound.py (NRL-style context rules + suffix morphology +
stress assignment; 99% phone accuracy on the embedded gold set,
tests/test_letter_to_sound.py).  Every lexicon word is unaffected.

Mandarin mirrors synthesize.py:59-84: text -> TONE3 pinyin (via pypinyin if
installed; otherwise the input must already be tone-numbered pinyin
tokens) -> lexicon initial/final phones, OOV -> "sp".
"""

import re

try:  # pragma: no cover - optional dependency
    from g2p_en import G2p as _G2p

    _g2p_model = None

    def _oov_to_phones(word):
        global _g2p_model
        if _g2p_model is None:
            _g2p_model = _G2p()
        return [p for p in _g2p_model(word) if p != " "]

except ImportError:
    _neural_g2p = None
    _neural_g2p_checked = False

    def _oov_to_phones(word):
        # OOV chain without g2p_en: the trained seq2seq model
        # (text/neural_g2p.py, weights shipped in text/data/) when
        # available, else the rule engine
        global _neural_g2p, _neural_g2p_checked
        if not _neural_g2p_checked:
            _neural_g2p_checked = True
            from fastspeech2_tpu.text import neural_g2p

            if neural_g2p.available():
                _neural_g2p = neural_g2p.NeuralG2P()
        if _neural_g2p is not None:
            phones = _neural_g2p(word)
            if phones:
                return phones
        from fastspeech2_tpu.text.letter_to_sound import letter_to_sound

        return letter_to_sound(word)


def read_lexicon(lex_path):
    """word -> [phones] (first pronunciation wins; synthesize.py:20-29)."""
    lexicon = {}
    with open(lex_path) as f:
        for line in f:
            temp = re.split(r"\s+", line.strip("\n"))
            word, phones = temp[0], temp[1:]
            if word.lower() not in lexicon:
                lexicon[word.lower()] = phones
    return lexicon


def _token_to_phones(w, lexicon):
    """One split token -> phones: lexicon hit, else verbalize digits
    (g2p_en does its own number expansion upstream, synthesize.py:36-43)
    and recurse per word, else rule-based letter-to-sound."""
    if w.lower() in lexicon:
        return list(lexicon[w.lower()])
    # quoted/parenthesized words must still hit the lexicon ('"alek"');
    # g2p_en strips these itself upstream
    stripped = w.strip("\"'()[]`“”‘’").lower()
    if stripped and stripped in lexicon:
        return list(lexicon[stripped])
    if re.search(r"[0-9]", w):
        from fastspeech2_tpu.text.numbers import normalize_numbers

        expanded = normalize_numbers(w)
        if expanded != w:
            phones = []
            # "twenty-one" / "five dollars, twenty cents" -> per-word lookup
            for part in re.split(r"[\s\-,]+", expanded):
                if part:
                    phones += _token_to_phones(part, lexicon)
            return phones
    return _oov_to_phones(w)


def english_to_phones(text, lexicon):
    """Sentence -> phone string '{HH AH0 ...}' with sp for punctuation."""
    from string import punctuation

    text = text.rstrip(punctuation)
    phones = []
    words = re.split(r"([,;.\-\?\!\s+])", text)
    for w in words:
        if w.lower() in lexicon:
            phones += lexicon[w.lower()]
        elif re.search(r"[A-Za-z0-9]", w):
            phones += _token_to_phones(w, lexicon)
        elif w.strip():
            # punctuation token: kept so the {sp} substitution below maps
            # it to a short pause, as g2p_en's passthrough does upstream
            phones.append(w.strip())
    out = "{" + "}{".join(phones) + "}"
    out = re.sub(r"\{[^\w\s]?\}", "{sp}", out)
    return out.replace("}{", " ")


def mandarin_to_phones(text, lexicon):
    """Hanzi or tone-numbered pinyin -> phone string."""
    try:  # pragma: no cover - optional dependency
        from pypinyin import Style, pinyin

        pinyins = [
            p[0] for p in pinyin(
                text, style=Style.TONE3, strict=False,
                neutral_tone_with_five=True)
        ]
    except ImportError:
        if re.search(r"[一-鿿]", text):
            raise RuntimeError(
                "pypinyin is unavailable: pass tone-numbered pinyin "
                "(e.g. 'ni3 hao3') instead of hanzi")
        pinyins = text.split()
    from fastspeech2_tpu.text.pinyin_g2p import split_pinyin

    phones = []
    for p in pinyins:
        if p in lexicon:
            phones += lexicon[p]
        else:
            # algorithmic decomposition (verified identical to the
            # reference pinyin lexicon), OOV -> sp as upstream
            decomposed = split_pinyin(p)
            if decomposed:
                phones += decomposed
            else:
                phones.append("sp")
    return "{" + " ".join(phones) + "}"

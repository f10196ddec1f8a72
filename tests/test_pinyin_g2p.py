"""Pinyin decomposition parity with the reference lexicon file."""

import os
import re

import pytest

from fastspeech2_tpu.text.g2p import mandarin_to_phones
from fastspeech2_tpu.text.pinyin_g2p import generate_lexicon, split_pinyin


def _reference_lexicon(reference_root):
    path = os.path.join(reference_root, "lexicon", "pinyin-lexicon-r.txt")
    lex = {}
    with open(path) as f:
        for line in f:
            t = re.split(r"\s+", line.strip())
            if t[0] not in lex:
                lex[t[0]] = t[1:]
    return lex


def test_split_matches_reference_lexicon(reference_root):
    lex = _reference_lexicon(reference_root)
    assert len(lex) == 4115
    mismatches = {k: (v, split_pinyin(k))
                  for k, v in lex.items() if split_pinyin(k) != v}
    assert mismatches == {}


def test_generated_lexicon_superset(reference_root):
    lex = _reference_lexicon(reference_root)
    gen = generate_lexicon()
    missing = {k for k in lex if gen.get(k) != lex[k]}
    assert missing == set()


@pytest.mark.parametrize("syll,phones", [
    ("zhuang1", ["zh", "uang1"]),
    ("liu3", ["l", "iou3"]),
    ("jun4", ["j", "vn4"]),
    ("er2", ["er2"]),
    ("huar1", ["h", "ua1", "rr"]),
    ("shi4", ["sh", "iii4"]),
    ("zi5", ["z", "ii5"]),
])
def test_split_examples(syll, phones):
    assert split_pinyin(syll) == phones


def test_invalid_syllables_rejected():
    assert split_pinyin("xyz1") is None
    assert split_pinyin("hello") is None
    assert split_pinyin("") is None


def test_mandarin_to_phones_lexicon_free():
    out = mandarin_to_phones("ni3 hao3 shi4 jie4", {})
    assert out == "{n i3 h ao3 sh iii4 j ie4}"


def test_mandarin_oov_becomes_sp():
    out = mandarin_to_phones("ni3 qqq hao3", {})
    assert out == "{n i3 sp h ao3}"

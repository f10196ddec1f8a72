"""The mined LJSpeech lexicon (lexicon/ljspeech-mined.txt) and its miner.

The reference ships lexicon/librispeech-lexicon.txt for synthesis-time
lookup (synthesize.py:20-29); that artifact is stripped from this mirror,
so text/mine_lexicon.py recovers a word->ARPAbet lexicon from the
reference's shipped aligned metadata (13,100 LJSpeech utterances).  These
tests pin the shipped artifact's integrity and the miner's accuracy.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEXICON = os.path.join(REPO, "lexicon", "ljspeech-mined.txt")
VAL = "/root/reference/preprocessed_data/LJSpeech/val.txt"


@pytest.fixture(scope="module")
def lexicon():
    from fastspeech2_tpu.text.g2p import read_lexicon

    assert os.path.exists(LEXICON), "generated artifact must be committed"
    return read_lexicon(LEXICON)


def test_lexicon_size_and_inventory(lexicon):
    from fastspeech2_tpu.text.symbols import symbols

    valid = {s[1:] for s in symbols if s.startswith("@")}
    assert len(lexicon) > 13000
    for word, phones in lexicon.items():
        assert phones, word
        for p in phones:
            assert p in valid, (word, p)


def test_known_entries(lexicon):
    # pronunciations visible verbatim in the reference metadata
    assert lexicon["oswald"] == ["AO1", "Z", "W", "AO0", "L", "D"]
    assert lexicon["permission"] == \
        ["P", "ER0", "M", "IH1", "SH", "AH0", "N"]
    assert lexicon["authorities"] == \
        ["AH0", "TH", "AO1", "R", "AH0", "T", "IY0", "Z"]


def test_alignment_on_reference_line(reference_root):
    """The miner's word segmentation on a real metadata line."""
    from fastspeech2_tpu.text.mine_lexicon import (
        align_words_to_phones,
        parse_metadata_line,
        tokenize_words,
    )

    with open(VAL) as f:
        raw, phones = parse_metadata_line(f.readline())
    occ = dict(align_words_to_phones(tokenize_words(raw), phones))
    assert occ["soviet"] == ["S", "OW1", "V", "IY0", "AH0", "T"]
    assert occ["denied"] == ["D", "IH0", "N", "AY1", "D"]


def test_roundtrip_accuracy_beats_rules(reference_root, lexicon):
    """Lexicon-based prediction vs the reference metadata: ~96% phone
    accuracy (residual = acoustically-chosen function-word variants the
    single-pronunciation upstream lexicon path also cannot express) vs
    ~72% for the rule engine alone."""
    from fastspeech2_tpu.text.mine_lexicon import roundtrip_accuracy

    acc = roundtrip_accuracy(VAL, lexicon, limit=40)
    assert acc > 0.90, acc


def test_english_to_phones_uses_mined_lexicon(lexicon):
    from fastspeech2_tpu.text.g2p import english_to_phones

    out = english_to_phones("Oswald denied permission", lexicon)
    assert out == ("{AO1 Z W AO0 L D D IH0 N AY1 D "
                   "P ER0 M IH1 SH AH0 N}")
    # quoted words still hit the lexicon (g2p_en strips quotes upstream)
    quoted = english_to_phones('he said "permission"', lexicon)
    assert "P ER0 M IH1 SH AH0 N" in quoted


def test_ljspeech_config_points_at_shipped_lexicon():
    import yaml

    with open(os.path.join(REPO, "config", "LJSpeech",
                           "preprocess.yaml")) as f:
        cfg = yaml.safe_load(f)
    path = cfg["path"]["lexicon_path"]
    assert os.path.exists(os.path.join(REPO, path)), path


def test_miner_majority_vote():
    """Variant pronunciations resolve to the most frequent one."""
    from fastspeech2_tpu.text.mine_lexicon import mine_lexicon

    meta = [
        "u1|S|{DH AH0 K AE1 T}|the cat",
        "u2|S|{DH AH0 D AO1 G}|the dog",
        "u3|S|{DH IY0 EH1 N D}|the end",
    ]
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("\n".join(meta) + "\n")
        path = f.name
    try:
        lex, stats = mine_lexicon([path])
    finally:
        os.unlink(path)
    assert stats["aligned"] == 3
    assert lex["the"] == ["DH", "AH0"]
    assert lex["cat"] == ["K", "AE1", "T"]
    assert lex["end"] == ["EH1", "N", "D"]

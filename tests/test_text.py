"""Text frontend parity tests against the reference symbol tables and
val.txt golden phone strings."""

import ast
import os

import pytest

from fastspeech2_tpu.text import sequence_to_text, text_to_sequence
from fastspeech2_tpu.text.symbols import symbols
from fastspeech2_tpu.text.numbers import normalize_numbers


def _parse_module_lists(path, names):
    tree = ast.parse(open(path).read())
    vals = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            try:
                vals[node.targets[0].id] = ast.literal_eval(node.value)
            except ValueError:
                pass
    return [vals[n] for n in names]


def _reference_symbols(reference_root):
    # Rebuild the reference's symbols list from its data tables without
    # importing it (its package pulls in unavailable deps).
    (cmu,) = _parse_module_lists(
        os.path.join(reference_root, "text/cmudict.py"), ["valid_symbols"]
    )
    initials, finals = _parse_module_lists(
        os.path.join(reference_root, "text/pinyin.py"), ["initials", "finals"]
    )
    pinyin = initials + finals + ["rr"]
    return (
        ["_"]
        + list("-")
        + list("!'(),.:;? ")
        + list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
        + ["@" + s for s in cmu]
        + ["@" + s for s in pinyin]
        + ["@sp", "@spn", "@sil"]
    )


def test_symbol_table_matches_reference(reference_root):
    ref = _reference_symbols(reference_root)
    assert symbols == ref
    assert len(symbols) == 360


def test_val_txt_roundtrip(reference_root):
    """Every {phones} string in the reference val.txt must encode to IDs and
    decode back to the identical phone string."""
    path = os.path.join(reference_root, "preprocessed_data/LJSpeech/val.txt")
    n = 0
    with open(path) as f:
        for line in f:
            _, _, phones, _ = line.rstrip("\n").split("|")
            seq = text_to_sequence(phones, ["english_cleaners"])
            assert len(seq) > 0
            assert all(0 < s < 360 for s in seq)
            # round-trip: "{A B C}" -> ids -> "{A B C}"
            assert sequence_to_text(seq) == phones.replace("}{", " ")
            n += 1
    assert n == 512


def test_phone_count_matches_brace_tokens(reference_root):
    path = os.path.join(reference_root, "preprocessed_data/LJSpeech/val.txt")
    with open(path) as f:
        line = f.readline()
    _, _, phones, _ = line.rstrip("\n").split("|")
    tokens = phones.strip("{}").split()
    seq = text_to_sequence(phones, ["english_cleaners"])
    assert len(seq) == len(tokens)


def test_char_level_encoding():
    seq = text_to_sequence("abc!", ["english_cleaners"])
    idx = {s: i for i, s in enumerate(symbols)}
    assert seq == [idx["a"], idx["b"], idx["c"], idx["!"]]


def test_mixed_braces_and_text():
    seq = text_to_sequence("go {HH OW1 M} now", ["english_cleaners"])
    idx = {s: i for i, s in enumerate(symbols)}
    assert seq == [
        idx["g"], idx["o"], idx[" "],
        idx["@HH"], idx["@OW1"], idx["@M"],
        idx[" "], idx["n"], idx["o"], idx["w"],
    ]


def test_pad_dropped():
    seq = text_to_sequence("_a_", ["basic_cleaners"])
    idx = {s: i for i, s in enumerate(symbols)}
    assert seq == [idx["a"]]


@pytest.mark.parametrize(
    "src,expected",
    [
        ("1999", "nineteen ninety-nine"),
        ("2000", "two thousand"),
        ("2008", "two thousand eight"),
        ("2400", "twenty-four hundred"),
        ("1905", "nineteen oh five"),
        ("100", "one hundred"),
        ("123", "one hundred twenty-three"),
        ("3000", "three thousand"),
        ("1006", "ten oh six"),  # 1000<n<3000 -> year-style pairs
        ("13", "thirteen"),
        ("$1.50", "one dollar, fifty cents"),
        ("$2", "two dollars"),
        ("£5", "five pounds"),
        ("1.5", "one point five"),
        ("21st", "twenty-first"),
        ("3rd", "third"),
        ("12th", "twelfth"),
        ("20th", "twentieth"),
        ("101st", "one hundred and first"),
        ("1,234", "twelve thirty-four"),  # commas stripped, then year-style
        ("123456", "one hundred twenty-three thousand, four hundred fifty-six"),
    ],
)
def test_normalize_numbers(src, expected):
    assert normalize_numbers(src) == expected


def test_english_cleaners_pipeline():
    from fastspeech2_tpu.text.cleaners import english_cleaners

    assert english_cleaners("Dr.  Smith   lives at No 42.") == (
        "doctor smith lives at no forty-two."
    )
    assert english_cleaners("Café Münster") == "cafe munster"
    assert english_cleaners("Mr. Jones, Jr.") == "mister jones, junior"


def test_g2p_verbalizes_digits():
    # Regression: the no-g2p_en OOV path must speak numbers, matching the
    # reference where g2p_en expands digits itself (synthesize.py:36-43).
    from fastspeech2_tpu.text.g2p import english_to_phones

    lex = {
        "i": ["AY1"], "have": ["HH", "AE1", "V"],
        "three": ["TH", "R", "IY1"], "cats": ["K", "AE1", "T", "S"],
        "and": ["AH0", "N", "D"], "dogs": ["D", "AO1", "G", "Z"],
        "twenty": ["T", "W", "EH1", "N", "T", "IY0"], "one": ["W", "AH1", "N"],
        "first": ["F", "ER1", "S", "T"], "the": ["DH", "AH0"],
    }
    out = english_to_phones("I have 3 cats and 21 dogs", lex)
    assert "TH R IY1" in out and "T W EH1 N T IY0 W AH1 N" in out
    # no spurious pause inside "twenty-one"
    assert "sp" not in out
    # ordinals verbalize too
    assert "F ER1 S T" in english_to_phones("the 21st", lex)


def test_g2p_hostile_inputs_never_crash_or_empty():
    """Serving sees arbitrary text: every input must yield a non-empty,
    in-vocabulary ID sequence (degenerate input maps to {sp} silence)."""
    from fastspeech2_tpu.text import text_to_sequence
    from fastspeech2_tpu.text.g2p import english_to_phones

    cases = ["", "   ", "!!!", "123", "café naïve", "e=mc^2", "🎉 party",
             "foo@bar.com", "a" * 300, "tab\there", "new\nline",
             "quote \"x\" 'y'", "10,000,000 dollars and 3.14 pies",
             "{AH0 B} braces", "mixed 中文 text", "\x00null"]
    for text in cases:
        phones = english_to_phones(text, {})
        assert phones, repr(text)
        ids = text_to_sequence(phones, ["english_cleaners"])
        assert len(ids) > 0, repr(text)
        assert all(0 <= i < 361 for i in ids), repr(text)

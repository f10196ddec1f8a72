"""ARPAbet phone inventory and CMU-dict lookup.

The inventory must match the reference's 84-symbol ARPAbet table ID-for-ID
(reference: text/cmudict.py:6-91) so that phone-ID sequences and trained
checkpoints are interchangeable.  Rather than hard-coding 84 strings, we
generate the table from the 39 standard ARPAbet base phones: every vowel
carries three stress variants (0/1/2) listed right after its unstressed form,
all in overall alphabetical order - exactly the reference's layout.
"""

_VOWELS = (
    "AA AE AH AO AW AY EH ER EY IH IY OW OY UH UW".split()
)
_CONSONANTS = (
    "B CH D DH F G HH JH K L M N NG P R S SH T TH V W Y Z ZH".split()
)

_BASE_PHONES = sorted(_VOWELS + _CONSONANTS)

valid_symbols = []
for _p in _BASE_PHONES:
    valid_symbols.append(_p)
    if _p in _VOWELS:
        valid_symbols.extend([_p + "0", _p + "1", _p + "2"])

_valid_symbol_set = set(valid_symbols)


class CMUDict:
    """Thin CMU pronouncing-dictionary reader (reference: text/cmudict.py:96-140).

    Maps a word to a list of ARPAbet pronunciations.  Used as a lexicon
    fallback; runtime G2P normally goes through
    :mod:`fastspeech2_tpu.text.g2p`.
    """

    def __init__(self, file_or_path, keep_ambiguous=True):
        if isinstance(file_or_path, str):
            with open(file_or_path, encoding="latin-1") as f:
                entries = _parse_cmudict(f)
        else:
            entries = _parse_cmudict(file_or_path)
        if not keep_ambiguous:
            entries = {w: p for w, p in entries.items() if len(p) == 1}
        self._entries = entries

    def __len__(self):
        return len(self._entries)

    def lookup(self, word):
        """Return list of ARPAbet pronunciations (space-joined strings)."""
        return self._entries.get(word.upper())


_ALT_RE = __import__("re").compile(r"\([0-9]+\)")


def _parse_cmudict(file):
    cmudict = {}
    for line in file:
        if len(line) and (line[0] >= "A" and line[0] <= "Z" or line[0] == "'"):
            parts = line.split("  ")
            word = _ALT_RE.sub("", parts[0])
            pron = _get_pronunciation(parts[1])
            if pron:
                cmudict.setdefault(word, []).append(pron)
    return cmudict


def _get_pronunciation(s):
    parts = s.strip().split(" ")
    for part in parts:
        if part not in _valid_symbol_set:
            return None
    return " ".join(parts)

"""Corpus adapter tests: synthetic miniature corpora in each dataset's
on-disk layout -> prepare_align -> raw_data/<speaker>/{*.wav,*.lab}
contract (reference preprocessor/{ljspeech,aishell3,libritts}.py)."""

import os

import numpy as np
from scipy.io import wavfile

from fastspeech2_tpu.preprocessing import PREPARE_ALIGN


def _tone(sr=22050, seconds=0.3, freq=220.0, amp=0.25):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)


def _config(corpus, raw):
    return {
        "path": {"corpus_path": str(corpus), "raw_path": str(raw)},
        "preprocessing": {
            "audio": {"sampling_rate": 22050, "max_wav_value": 32768.0},
            "text": {"text_cleaners": ["english_cleaners"]},
        },
    }


def test_ljspeech_adapter(tmp_path):
    corpus = tmp_path / "LJSpeech-1.1"
    os.makedirs(corpus / "wavs")
    wavfile.write(str(corpus / "wavs" / "LJ001-0001.wav"), 22050, _tone())
    wavfile.write(str(corpus / "wavs" / "LJ001-0002.wav"), 22050,
                  _tone(freq=330))
    # metadata: id|raw|normalized ; adapter reads field 2 and cleans it
    (corpus / "metadata.csv").write_text(
        "LJ001-0001|raw|Printing, Mr. Smith bought 2 books.\n"
        "LJ001-0002|raw|The second sentence.\n"
        "LJ001-0003|raw|Missing wav is skipped.\n")
    raw = tmp_path / "raw"
    PREPARE_ALIGN["LJSpeech"](_config(corpus, raw))

    spk = raw / "LJSpeech"
    assert sorted(os.listdir(spk)) == [
        "LJ001-0001.lab", "LJ001-0001.wav",
        "LJ001-0002.lab", "LJ001-0002.wav"]
    lab = (spk / "LJ001-0001.lab").read_text()
    # english_cleaners: lowercase, abbreviation + number expansion
    assert lab == "printing, mister smith bought two books."
    sr, wav = wavfile.read(str(spk / "LJ001-0001.wav"))
    assert sr == 22050 and wav.dtype == np.int16
    # peak-normalized to max_wav_value (reference ljspeech.py:28-30)
    assert 32700 <= np.abs(wav).max() <= 32767


def test_aishell3_adapter(tmp_path):
    corpus = tmp_path / "aishell3"
    wav_dir = corpus / "train" / "wav" / "SSB0005"
    os.makedirs(wav_dir)
    wavfile.write(str(wav_dir / "SSB00050001.wav"), 22050, _tone())
    os.makedirs(corpus / "train", exist_ok=True)
    # content.txt: wav_name<TAB>hanzi pinyin alternating
    (corpus / "train" / "content.txt").write_text(
        "SSB00050001.wav\t广 guang3 州 zhou1 女 nv3\n"
        "SSB00050002.wav\t无 wu2\n")  # missing wav -> skipped
    raw = tmp_path / "raw"
    PREPARE_ALIGN["AISHELL3"](_config(corpus, raw))

    spk = raw / "SSB0005"
    assert sorted(os.listdir(spk)) == [
        "SSB00050001.lab", "SSB00050001.wav"]
    # pinyin = every 2nd token (reference aishell3.py:20)
    assert (spk / "SSB00050001.lab").read_text() == "guang3 zhou1 nv3"


def test_libritts_adapter(tmp_path):
    corpus = tmp_path / "libritts"
    ch = corpus / "19" / "198"
    os.makedirs(ch)
    wavfile.write(str(ch / "19_198_000000_000000.wav"), 22050, _tone())
    (ch / "19_198_000000_000000.normalized.txt").write_text(
        "This is Chapter 1.\n")
    wavfile.write(str(ch / "19_198_000001_000000.wav"), 22050, _tone())
    # no .normalized.txt for the second -> skipped
    raw = tmp_path / "raw"
    PREPARE_ALIGN["LibriTTS"](_config(corpus, raw))

    spk = raw / "19"
    assert sorted(os.listdir(spk)) == [
        "19_198_000000_000000.lab", "19_198_000000_000000.wav"]
    assert (spk / "19_198_000000_000000.lab").read_text() == \
        "this is chapter one."


def test_cmudict_class(tmp_path):
    """CMUDict lookup parity (reference text/cmudict.py:96-140): file
    parsing, multi-pronunciation entries, case-insensitive lookup."""
    from fastspeech2_tpu.text.cmudict import CMUDict

    p = tmp_path / "cmudict.txt"
    p.write_text(
        ";;; comment line\n"
        "HELLO  HH AH0 L OW1\n"
        "HELLO(1)  HH EH0 L OW1\n"
        "WORLD  W ER1 L D\n"
        "BAD*WORD  X Y Z\n")   # invalid symbols -> dropped
    d = CMUDict(str(p))
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("WORLD") == ["W ER1 L D"]
    assert d.lookup("absent") is None
    assert len(d) == 2

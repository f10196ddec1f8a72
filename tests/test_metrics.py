"""Objective quality metrics: MCD + F0 metrics sanity and invariants."""

import numpy as np

from fastspeech2_tpu.evaluation import f0_metrics, mcd
from fastspeech2_tpu.evaluation.metrics import _dct_ortho, _dtw_path


def _tone(freq, seconds=1.0, sr=22050, vibrato=0.0):
    t = np.arange(int(sr * seconds)) / sr
    f = freq * (1 + vibrato * np.sin(2 * np.pi * 3.0 * t))
    phase = 2 * np.pi * np.cumsum(f) / sr
    return (0.5 * np.sin(phase)).astype(np.float32)


def test_dct_matches_scipy_convention():
    x = np.random.RandomState(0).randn(4, 16)
    c = _dct_ortho(x, 16)
    # orthonormal: transform preserves energy
    np.testing.assert_allclose((c ** 2).sum(), (x ** 2).sum(), rtol=1e-6)


def test_dtw_identity_is_diagonal():
    cost = 1.0 - np.eye(5)
    path = _dtw_path(cost)
    assert path == [(i, i) for i in range(5)]


def test_mcd_zero_for_identical_and_orders_similarity():
    a = _tone(220.0)
    b = _tone(233.0)          # a semitone away: small timbre change
    noise = np.random.RandomState(1).randn(len(a)).astype(np.float32) * 0.3
    assert mcd(a, a) < 1e-4
    d_near = mcd(a, b)
    d_far = mcd(a, noise)
    assert 0 < d_near < d_far


def test_f0_metrics_detect_pitch_shift():
    a = _tone(200.0, vibrato=0.01)
    b = _tone(220.0, vibrato=0.01)
    m = f0_metrics(a, b)
    # both fully voiced; RMSE ~ the 20 Hz shift
    assert m["voicing_f1"] > 0.9
    assert 10.0 < m["f0_rmse_hz"] < 30.0
    same = f0_metrics(a, a)
    assert same["f0_rmse_hz"] < 1.0
    assert same["voicing_f1"] > 0.99


def test_metrics_cli(tmp_path):
    import json
    import subprocess
    import sys

    from fastspeech2_tpu.audio.wav import save_wav

    a = tmp_path / "a.wav"
    b = tmp_path / "b.wav"
    save_wav(str(a), _tone(220.0), 22050)
    save_wav(str(b), _tone(220.0), 22050)
    out = subprocess.run(
        [sys.executable, "-m", "fastspeech2_tpu.evaluation.metrics",
         str(a), str(b)],
        capture_output=True, text=True, check=True,
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu",
             # share the suite's persistent compile cache: the bare env
             # has no conftest, so without this the subprocess recompiles
             # DIO/mel every run (~13 s)
             "JAX_COMPILATION_CACHE_DIR":
                 "/tmp/fastspeech2_tpu_test_jit_cache",
             "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1.0",
             "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES": "0",
             "HOME": "/root"})
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["mcd_db"] < 0.5
    assert got["voicing_f1"] > 0.99


def test_vocoder_copy_synthesis_eval(tmp_path):
    """Pipeline validity: GT -> mel -> (random tiny vocoder) -> metrics.
    A random vocoder scores badly but the plumbing must produce finite
    numbers with the right keys."""
    from fastspeech2_tpu.audio.wav import save_wav
    from fastspeech2_tpu.evaluation.vocoder_eval import evaluate_vocoder
    from fastspeech2_tpu.synthesis.vocoder import HiFiGANVocoder

    wav = tmp_path / "gt.wav"
    # 1.0 s matches the DIO graph shape other tests compile
    save_wav(str(wav), _tone(220.0, seconds=1.0), 22050)
    vocoder = HiFiGANVocoder(config={
        "upsample_rates": [8, 4], "upsample_kernel_sizes": [16, 8],
        "upsample_initial_channel": 32, "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]], "num_mels": 80,
        "gen_istft_n_fft": 16, "gen_istft_hop_size": 8})
    per_file, mean = evaluate_vocoder(vocoder, [str(wav)])
    assert len(per_file) == 1
    assert np.isfinite(mean["mcd_db"]) and mean["mcd_db"] > 0
    assert set(mean) >= {"mcd_db", "voicing_f1"}


def test_evaluate_cli_objective(tmp_path, capsys):
    """evaluate.py --objective: text -> wav for val utterances, scored
    against the saved trimmed GT wavs (plumbing test on a synthetic
    corpus with a random-init model + griffin-lim vocoder)."""
    import os
    import yaml

    from test_preprocessing import _config, _make_raw_corpus
    from fastspeech2_tpu.preprocessing import Preprocessor
    from fastspeech2_tpu.cli.evaluate_cli import main

    raw, out = _make_raw_corpus(str(tmp_path), n_utts=2)
    pre_cfg = _config(raw, out)
    pre_cfg["preprocessing"]["audio"]["save_trimmed_wav"] = True
    Preprocessor(pre_cfg).build_from_path()

    model_cfg = {
        "transformer": {
            "encoder_layer": 1, "encoder_head": 2, "encoder_hidden": 16,
            "decoder_layer": 1, "decoder_head": 2, "decoder_hidden": 16,
            "conv_filter_size": 32, "conv_kernel_size": [9, 1],
            "encoder_dropout": 0.2, "decoder_dropout": 0.2,
        },
        "variance_predictor": {"filter_size": 16, "kernel_size": 3,
                               "dropout": 0.5},
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear",
                               "n_bins": 16},
        "postnet": {"embedding_dim": 16, "kernel_size": 5,
                    "n_convolutions": 3},
        "multi_speaker": False, "max_seq_len": 256,
        "vocoder": {"model": "none", "speaker": "LJSpeech"},
    }
    train_cfg = {
        "bucket": {"text": 8, "mel": 32},
        "path": {"ckpt_path": str(tmp_path / "ckpt"),
                 "log_path": str(tmp_path / "log"),
                 "result_path": str(tmp_path / "result")},
        "optimizer": {"batch_size": 2, "betas": [0.9, 0.98], "eps": 1e-9,
                      "grad_clip_thresh": 1.0, "warm_up_step": 10,
                      "anneal_steps": [], "anneal_rate": 1.0},
        "step": {"total_step": 2, "log_step": 1, "synth_step": 100,
                 "val_step": 100, "save_step": 2},
    }
    paths = {}
    for name, c in [("preprocess", pre_cfg), ("model", model_cfg),
                    ("train", train_cfg)]:
        p = tmp_path / f"{name}.yaml"
        p.write_text(yaml.safe_dump(c))
        paths[name] = str(p)
    losses = main(["-p", paths["preprocess"], "-m", paths["model"],
                   "-t", paths["train"], "--objective", "2"])
    assert all(np.isfinite(float(v)) for v in losses)
    assert os.path.isdir(os.path.join(out, "wav"))
    # the objective pass scored at least one utterance
    captured = capsys.readouterr().out
    assert '"objective_mean"' in captured and '"mcd_db"' in captured


def test_demo_page_generator(tmp_path):
    from fastspeech2_tpu.audio.wav import save_wav
    from fastspeech2_tpu.evaluation.demo_page import write_demo_page

    a = tmp_path / "u1.wav"
    b = tmp_path / "u1_syn.wav"
    save_wav(str(a), _tone(220.0, seconds=0.2), 22050)
    save_wav(str(b), _tone(220.0, seconds=0.2), 22050)
    out = tmp_path / "demo"
    page = write_demo_page([(str(a), str(b))], str(out),
                           title="t <x>", subtitle="s")
    html_src = open(page).read()
    assert "t &lt;x&gt;" in html_src
    assert (out / "00_u1_ref.wav").exists() and (out / "00_u1_syn.wav").exists()
    assert html_src.count("<audio") == 2

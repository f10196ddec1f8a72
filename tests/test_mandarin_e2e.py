"""Mandarin + multi-speaker end-to-end: AISHELL3-style config (zh text
frontend, speaker embeddings) through training and synthesis."""

import os

import numpy as np
import pytest
import yaml

from fastspeech2_tpu.data import generate_corpus, synthetic_preprocess_config


def _zh_corpus(root, n_utts=16, n_speakers=3):
    """Synthetic corpus whose metadata uses pinyin-derived phone strings."""
    import json

    from fastspeech2_tpu.text.pinyin_g2p import generate_lexicon

    corpus = os.path.join(root, "corpus")
    generate_corpus(corpus, n_utterances=n_utts, n_speakers=n_speakers,
                    seed=5, val_size=4, n_mels=8)
    # rewrite metadata phone strings with pinyin phones
    lex = generate_lexicon()
    sylls = sorted(lex)[100:200]
    rng = np.random.RandomState(0)
    for split in ("train.txt", "val.txt"):
        path = os.path.join(corpus, split)
        lines = open(path).read().strip().split("\n")
        out = []
        for line in lines:
            base, spk, _, raw = line.split("|")
            dur = np.load(os.path.join(
                corpus, "duration", f"{spk}-duration-{base}.npy"))
            phones = []
            while len(phones) < len(dur):
                phones += lex[sylls[rng.randint(len(sylls))]]
            phones = phones[: len(dur)]
            out.append("|".join(
                [base, spk, "{" + " ".join(phones) + "}", raw]))
        with open(path, "w") as f:
            f.write("\n".join(out) + "\n")
    return corpus


@pytest.fixture(scope="module")
def zh_workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zh"))
    corpus = _zh_corpus(root)
    pre = synthetic_preprocess_config(corpus, n_mels=8)
    pre["preprocessing"]["text"]["text_cleaners"] = []
    pre["preprocessing"]["text"]["language"] = "zh"
    model = {
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
        "multi_speaker": True,
        "max_seq_len": 128,
        "vocoder": {"model": "none", "speaker": "universal"},
    }
    train = {
        # single-bucket shapes: one train-step compile (see test_e2e.py)
        "bucket": {"text": 24, "mel": 192},
        "path": {
            "ckpt_path": os.path.join(root, "ckpt"),
            "log_path": os.path.join(root, "log"),
            "result_path": os.path.join(root, "result"),
        },
        "optimizer": {
            "batch_size": 4, "betas": [0.9, 0.98], "eps": 1.0e-9,
            "weight_decay": 0.0, "grad_clip_thresh": 1.0,
            "grad_acc_step": 1, "warm_up_step": 10,
            "anneal_steps": [], "anneal_rate": 1.0,
        },
        "step": {"total_step": 4, "log_step": 2, "synth_step": 1000,
                 "val_step": 1000, "save_step": 4},
    }
    paths = {}
    for name, cfg in [("preprocess", pre), ("model", model),
                      ("train", train)]:
        p = os.path.join(root, f"{name}.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        paths[name] = p
    return root, paths, (pre, model, train)


def test_zh_multispeaker_training(zh_workspace):
    root, paths, (pre, model_cfg, train_cfg) = zh_workspace
    import jax.numpy as jnp

    from fastspeech2_tpu.training.loop import train as train_loop

    state = train_loop(pre, model_cfg, train_cfg, dtype=jnp.float32,
                       log=lambda *_: None)
    assert int(state.step) == 4
    assert "speaker_emb" in state.params
    assert state.params["speaker_emb"]["embedding"].shape[0] == 3


def test_zh_synthesize_single(zh_workspace):
    root, paths, _ = zh_workspace
    from fastspeech2_tpu.cli.synthesize_cli import main

    main([
        "--mode", "single", "--text", "ni3 hao3 shi4 jie4",
        "--speaker_id", "2",
        "-p", paths["preprocess"], "-m", paths["model"],
        "-t", paths["train"], "--restore_step", "4",
    ])
    result = os.path.join(root, "result")
    files = os.listdir(result)
    assert any(f.endswith(".wav") for f in files)

"""End-to-end integration: synthetic corpus -> train via the CLI loop ->
evaluate -> synthesize, exercising the same paths the command-line tools
use (SURVEY.md section 4 integration strategy)."""

import json
import os

import numpy as np
import pytest
import yaml

from fastspeech2_tpu.data import generate_corpus, synthetic_preprocess_config


def _tiny_model_config():
    return {
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
        # without this block the PostNet defaults to the reference's
        # 512ch x 5 convs, which dominates tiny-model step compute
        "postnet": {"embedding_dim": 16, "kernel_size": 5,
                    "n_convolutions": 3},
        "multi_speaker": False,
        "max_seq_len": 256,
        "vocoder": {"model": "none", "speaker": "LJSpeech"},
    }


def _train_config(root):
    return {
        # one bucket covering every synthetic utterance (phones <= 24,
        # mel <= 192): a single compiled train-step shape instead of
        # one compile per (text, mel) bucket combination
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
        "step": {
            "total_step": 12, "log_step": 4, "synth_step": 1000,
            "val_step": 6, "save_step": 12,
        },
    }


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    corpus = os.path.join(root, "corpus")
    generate_corpus(corpus, n_utterances=24, n_speakers=1, seed=3,
                    val_size=4, n_mels=8)
    pre = synthetic_preprocess_config(corpus, n_mels=8)
    model = _tiny_model_config()
    train = _train_config(root)
    paths = {}
    for name, cfg in [("preprocess", pre), ("model", model),
                      ("train", train)]:
        p = os.path.join(root, f"{name}.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        paths[name] = p
    return root, paths, (pre, model, train)


def test_training_loop_runs_and_checkpoints(workspace):
    root, paths, (pre, model_cfg, train_cfg) = workspace
    import jax.numpy as jnp

    from fastspeech2_tpu.training.loop import train

    state = train(pre, model_cfg, train_cfg, dtype=jnp.float32,
                  log=lambda *_: None)
    assert int(state.step) == 12
    assert os.path.isdir(os.path.join(root, "ckpt", "12"))
    log_txt = os.path.join(root, "log", "train", "log.txt")
    assert os.path.exists(log_txt)
    content = open(log_txt).read()
    assert "Step 12/12" in content
    assert "Total Loss" in content


def test_preemption_checkpoints_and_resumes(workspace):
    """SIGTERM mid-training must checkpoint at the step boundary and exit
    cleanly; --restore_step -1 (elastic resume) then picks that step up."""
    import copy
    import signal
    import threading

    import jax.numpy as jnp

    from fastspeech2_tpu.training.checkpoint import latest_step
    from fastspeech2_tpu.training.loop import train

    root, paths, (pre, model_cfg, train_cfg) = workspace
    cfg = copy.deepcopy(train_cfg)
    cfg["step"]["total_step"] = 100000   # far more than we'll run
    cfg["step"]["save_step"] = 100000
    cfg["path"]["ckpt_path"] = os.path.join(root, "ckpt_preempt")
    cfg["path"]["log_path"] = os.path.join(root, "log_preempt")

    started = threading.Event()

    def fire():
        started.wait()
        # let a few steps land after the first log line, then preempt
        import time
        time.sleep(3)
        os.kill(os.getpid(), signal.SIGTERM)

    killer = threading.Thread(target=fire, daemon=True)
    killer.start()

    def log(msg):
        started.set()

    state = train(pre, model_cfg, cfg, dtype=jnp.float32, log=log)
    stopped_at = int(state.step)
    assert 0 < stopped_at < 100000
    assert latest_step(cfg["path"]["ckpt_path"]) == stopped_at

    # elastic resume from the preemption checkpoint for a couple steps
    # (the CLI resolves --restore_step -1 via latest_step the same way)
    cfg2 = copy.deepcopy(cfg)
    cfg2["step"]["total_step"] = stopped_at + 2
    state2 = train(pre, model_cfg, cfg2,
                   restore_step=latest_step(cfg["path"]["ckpt_path"]),
                   dtype=jnp.float32, log=lambda *_: None)
    assert int(state2.step) == stopped_at + 2


def test_evaluate_cli(workspace):
    root, paths, _ = workspace
    from fastspeech2_tpu.cli.evaluate_cli import main

    losses = main([
        "-p", paths["preprocess"], "-m", paths["model"],
        "-t", paths["train"], "--restore_step", "12",
    ])
    assert len(losses) == 6
    assert all(np.isfinite(v) for v in losses)


def test_synthesize_cli_single(workspace):
    root, paths, _ = workspace
    from fastspeech2_tpu.cli.synthesize_cli import main

    main([
        "--mode", "single", "--text", "hello world",
        "-p", paths["preprocess"], "-m", paths["model"],
        "-t", paths["train"], "--restore_step", "12",
        "--duration_control", "1.2",
    ])
    result = os.path.join(root, "result")
    files = os.listdir(result)
    assert any(f.endswith(".png") for f in files)
    assert any(f.endswith(".wav") for f in files)


def test_synthesize_cli_batch(workspace):
    root, paths, (pre, _, _) = workspace
    src = os.path.join(root, "source.txt")
    with open(src, "w") as f:
        f.write("demo1|spk0|{HH AH0 L OW1}|hello\n"
                "demo2|spk0|{W ER1 L D}|world\n")
    from fastspeech2_tpu.cli.synthesize_cli import main

    main([
        "--mode", "batch", "--source", src,
        "-p", paths["preprocess"], "-m", paths["model"],
        "-t", paths["train"], "--restore_step", "12",
    ])
    result = os.path.join(root, "result")
    assert os.path.exists(os.path.join(result, "demo1.wav"))
    assert os.path.exists(os.path.join(result, "demo2.png"))


def test_training_loop_with_grad_accumulation(workspace, tmp_path):
    """grad_acc_step > 1 through the real loop: batches get a micro axis
    and training proceeds (regression: the loop used to feed flat batches
    to the accumulating step function)."""
    root, paths, (pre, model_cfg, train_cfg) = workspace
    import copy

    import jax.numpy as jnp

    from fastspeech2_tpu.training.loop import train

    cfg = copy.deepcopy(train_cfg)
    cfg["optimizer"]["grad_acc_step"] = 2
    cfg["path"] = {k: os.path.join(str(tmp_path), k)
                   for k in ("ckpt_path", "log_path", "result_path")}
    cfg["step"] = dict(cfg["step"], total_step=3, log_step=1, val_step=100,
                       synth_step=100, save_step=3)
    state = train(pre, model_cfg, cfg, dtype=jnp.float32,
                  log=lambda *_: None)
    assert int(state.step) == 3


def test_synthesize_cli_with_torch_ckpt(workspace, tmp_path):
    """--torch_ckpt: run synthesis directly from a reference-format
    .pth.tar (here produced by our own exporter)."""
    pytest.importorskip("torch")
    root, paths, (pre, model_cfg, train_cfg) = workspace
    import jax

    from fastspeech2_tpu.cli.common import load_model_for_inference
    from fastspeech2_tpu.configs.config import FastSpeech2Config
    from fastspeech2_tpu.convert.to_torch import save_torch_checkpoint

    configs = (pre, model_cfg, train_cfg)
    _, variables, cfg = load_model_for_inference(configs, restore_step=12)
    ckpt = str(tmp_path / "export.pth.tar")
    save_torch_checkpoint(ckpt, jax.device_get(variables), cfg)

    from fastspeech2_tpu.cli.synthesize_cli import main

    main([
        "--mode", "single", "--text", "torch checkpoint roundtrip",
        "-p", paths["preprocess"], "-m", paths["model"],
        "-t", paths["train"], "--torch_ckpt", ckpt,
    ])
    result = os.path.join(root, "result")
    assert os.path.exists(os.path.join(result,
                                       "torch checkpoint roundtrip.wav"))


def test_training_loop_scan_mode(workspace, tmp_path):
    """train.yaml `step: scan_step` runs the device-resident scanned path
    end-to-end: duty boundaries respected, checkpoint written, log rates
    reported."""
    import copy

    import jax.numpy as jnp

    from fastspeech2_tpu.training.loop import train

    root, paths, (pre, model_cfg, train_cfg) = workspace
    cfg = copy.deepcopy(train_cfg)
    cfg["path"] = {
        "ckpt_path": str(tmp_path / "ckpt"),
        "log_path": str(tmp_path / "log"),
        "result_path": str(tmp_path / "result"),
    }
    cfg["step"]["scan_step"] = 4  # gcd(4, log 4, val 6, save 12) = 2
    msgs = []
    state = train(pre, model_cfg, cfg, dtype=jnp.float32, log=msgs.append)
    assert int(state.step) == 12
    assert os.path.isdir(str(tmp_path / "ckpt" / "12"))
    assert any("scan mode:" in m for m in msgs), msgs
    content = open(str(tmp_path / "log" / "train" / "log.txt")).read()
    assert "Step 12/12" in content
    # val duty fired at its boundary inside the scanned loop
    assert any("Validation Step 6" in m for m in msgs), msgs

"""Typed configuration for the TPU FastSpeech 2 stack.

The on-disk format is the reference's three-YAML-per-dataset schema
(config/<ds>/{preprocess,model,train}.yaml, documented in the reference's
config/README.md); `load_yaml_configs` reads those files and
`FastSpeech2Config.build` flattens them (plus stats.json / speakers.json)
into an immutable dataclass the model consumes — no file reads inside model
code, unlike the reference (model/modules.py:41-46, model/fastspeech2.py:30-41).
"""

import dataclasses
import json
import os
from typing import Sequence, Tuple

import yaml


def load_yaml_configs(preprocess_path, model_path, train_path):
    with open(preprocess_path) as f:
        preprocess = yaml.safe_load(f)
    with open(model_path) as f:
        model = yaml.safe_load(f)
    with open(train_path) as f:
        train = yaml.safe_load(f)
    return preprocess, model, train


def load_dataset_configs(dataset, config_root=None):
    """Load the bundled preset for a dataset name (LJSpeech, AISHELL3, ...)."""
    if config_root is None:
        config_root = os.path.join(os.path.dirname(__file__))
    base = os.path.join(config_root, dataset)
    return load_yaml_configs(
        os.path.join(base, "preprocess.yaml"),
        os.path.join(base, "model.yaml"),
        os.path.join(base, "train.yaml"),
    )


@dataclasses.dataclass(frozen=True)
class FastSpeech2Config:
    """Everything the acoustic model needs, statically."""

    # transformer
    vocab_size: int = 361
    encoder_layer: int = 4
    encoder_head: int = 2
    encoder_hidden: int = 256
    decoder_layer: int = 6
    decoder_head: int = 2
    decoder_hidden: int = 256
    conv_filter_size: int = 1024
    conv_kernel_size: Tuple[int, int] = (9, 1)
    encoder_dropout: float = 0.2
    decoder_dropout: float = 0.2
    # variance predictor
    vp_filter_size: int = 256
    vp_kernel_size: int = 3
    vp_dropout: float = 0.5
    # variance embedding
    pitch_quantization: str = "linear"   # 'linear' | 'log'
    energy_quantization: str = "linear"
    n_bins: int = 256
    pitch_min: float = 0.0
    pitch_max: float = 1.0
    energy_min: float = 0.0
    energy_max: float = 1.0
    pitch_feature_level: str = "phoneme_level"   # | 'frame_level'
    energy_feature_level: str = "phoneme_level"
    # postnet
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5
    # sizes
    n_mel_channels: int = 80
    max_seq_len: int = 1000
    multi_speaker: bool = False
    n_speaker: int = 1
    # kernels: "auto" = Pallas fused kernels on TPU, XLA elsewhere
    attention_backend: str = "auto"
    ffn_backend: str = "auto"
    # rematerialize FFT blocks in backward (memory for FLOPs trade)
    remat: bool = False

    @classmethod
    def build(cls, preprocess_config, model_config, stats=None, n_speaker=None):
        """Flatten reference-schema YAML dicts into a config.

        stats: the stats.json dict ({"pitch": [min,max,mean,std], ...}); if
        None, read from preprocessed_path when present.
        """
        pp = preprocess_config["preprocessing"]
        tr = model_config["transformer"]
        vp = model_config["variance_predictor"]
        ve = model_config["variance_embedding"]
        pre_path = preprocess_config["path"]["preprocessed_path"]
        if stats is None:
            stats_path = os.path.join(pre_path, "stats.json")
            if os.path.exists(stats_path):
                with open(stats_path) as f:
                    stats = json.load(f)
            else:
                # Unit-range placeholder bins: fine for random-init tests and
                # benchmarks, WRONG for trained weights (the variance adaptor
                # quantizes pitch/energy against the corpus stats the weights
                # were trained with).  Loud, because the failure mode is
                # silently degraded prosody, not a crash.
                import warnings
                warnings.warn(
                    f"stats.json not found under {pre_path!r}; using unit "
                    "pitch/energy ranges. Synthesis/evaluation from TRAINED "
                    "weights will mis-bin pitch and energy — regenerate the "
                    "corpus artifacts (align.py + preprocess.py) first.",
                    stacklevel=2)
                stats = {"pitch": [0.0, 1.0], "energy": [0.0, 1.0]}
        multi = bool(model_config.get("multi_speaker", False))
        if n_speaker is None:
            speakers_path = os.path.join(pre_path, "speakers.json")
            if multi and os.path.exists(speakers_path):
                with open(speakers_path) as f:
                    n_speaker = len(json.load(f))
            else:
                n_speaker = 1
        return cls(
            encoder_layer=tr["encoder_layer"],
            encoder_head=tr["encoder_head"],
            encoder_hidden=tr["encoder_hidden"],
            decoder_layer=tr["decoder_layer"],
            decoder_head=tr["decoder_head"],
            decoder_hidden=tr["decoder_hidden"],
            conv_filter_size=tr["conv_filter_size"],
            conv_kernel_size=tuple(tr["conv_kernel_size"]),
            encoder_dropout=tr["encoder_dropout"],
            decoder_dropout=tr["decoder_dropout"],
            vp_filter_size=vp["filter_size"],
            vp_kernel_size=vp["kernel_size"],
            vp_dropout=vp["dropout"],
            pitch_quantization=ve["pitch_quantization"],
            energy_quantization=ve["energy_quantization"],
            n_bins=ve["n_bins"],
            pitch_min=float(stats["pitch"][0]),
            pitch_max=float(stats["pitch"][1]),
            energy_min=float(stats["energy"][0]),
            energy_max=float(stats["energy"][1]),
            pitch_feature_level=pp["pitch"]["feature"],
            energy_feature_level=pp["energy"]["feature"],
            n_mel_channels=pp["mel"]["n_mel_channels"],
            max_seq_len=model_config["max_seq_len"],
            multi_speaker=multi,
            n_speaker=n_speaker,
            attention_backend=model_config.get("attention_backend", "auto"),
            ffn_backend=model_config.get("ffn_backend", "auto"),
            remat=bool(model_config.get("remat", False)),
            # optional superset block: the reference hardcodes its PostNet
            # (transformer/Layers.py:67-137); an absent block keeps those
            # exact defaults
            postnet_embedding_dim=model_config.get(
                "postnet", {}).get("embedding_dim", 512),
            postnet_kernel_size=model_config.get(
                "postnet", {}).get("kernel_size", 5),
            postnet_n_convolutions=model_config.get(
                "postnet", {}).get("n_convolutions", 5),
        )


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Noam Adam settings (reference train.yaml optimizer block)."""

    batch_size: int = 16
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-9
    weight_decay: float = 0.0
    grad_clip_thresh: float = 1.0
    grad_acc_step: int = 1
    warm_up_step: int = 4000
    anneal_steps: Sequence[int] = (300000, 400000, 500000)
    anneal_rate: float = 0.3
    # "bfloat16" stores Adam's first moment in bf16, halving its HBM
    # traffic share of the (memory-bound, ~1.7 ms) optimizer step —
    # docs/tpu_notes.md "MFU ceiling".  Default fp32 = reference parity.
    mu_dtype: str = "float32"

    @staticmethod
    def build_batch_size(train_config):
        return int(train_config["optimizer"]["batch_size"])

    @classmethod
    def build(cls, train_config):
        o = train_config["optimizer"]
        return cls(
            batch_size=o["batch_size"],
            betas=tuple(o["betas"]),
            eps=float(o["eps"]),
            weight_decay=float(o.get("weight_decay", 0.0)),
            grad_clip_thresh=float(o["grad_clip_thresh"]),
            grad_acc_step=int(o.get("grad_acc_step", 1)),
            warm_up_step=int(o["warm_up_step"]),
            anneal_steps=tuple(o["anneal_steps"]),
            anneal_rate=float(o["anneal_rate"]),
            mu_dtype=str(o.get("mu_dtype", "float32")),
        )


@dataclasses.dataclass(frozen=True)
class StepConfig:
    total_step: int = 900000
    log_step: int = 100
    synth_step: int = 1000
    val_step: int = 1000
    save_step: int = 100000

    @classmethod
    def build(cls, train_config):
        s = train_config["step"]
        return cls(
            total_step=s["total_step"],
            log_step=s["log_step"],
            synth_step=s["synth_step"],
            val_step=s["val_step"],
            save_step=s["save_step"],
        )

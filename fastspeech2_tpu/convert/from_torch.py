"""PyTorch checkpoint -> Flax parameter conversion.

Loads the reference's `{step}.pth.tar` FastSpeech2 checkpoints
(train.py:151-161 dict layout: {"model": state_dict, "optimizer": ...}) and
HiFi-GAN generator checkpoints ({"generator": state_dict},
utils/model.py:66) into this framework's parameter trees, so pretrained
reference models run bit-faithfully on TPU.

Tensor layout conventions:
  torch nn.Linear weight [out, in]     -> flax Dense kernel [in, out]
  torch nn.Conv1d weight [out, in, k]  -> flax Conv kernel  [k, in, out]
  torch nn.ConvTranspose1d [in, out, k]-> flax ConvTranspose kernel [k, in, out]
  torch LayerNorm/BatchNorm weight     -> scale
  weight-norm (weight_g, weight_v)     -> folded: g * v / ||v||
"""

import numpy as np


def _t(x):
    """torch tensor -> numpy float32."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def linear(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def conv1d(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def conv_transpose1d(sd, prefix):
    # torch ConvTranspose1d weight: [in, out, k] -> flax [k, in, out];
    # torch's transposed conv scatters the kernel time-reversed relative to
    # flax's fractionally-strided conv, so flip the spatial axis.
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 0, 1)[::-1].copy()}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def layer_norm(sd, prefix):
    return {
        "scale": _t(sd[prefix + ".weight"]),
        "bias": _t(sd[prefix + ".bias"]),
    }


def embedding(sd, prefix):
    return {"embedding": _t(sd[prefix + ".weight"])}


def _wrap_dense(m):
    return {"Dense_0": m}


def _wrap_conv(m):
    return {"Conv_0": m}


def _wrap_ln(m):
    return {"LayerNorm_0": m}


def _fft_block(sd, prefix):
    """One reference FFTBlock (transformer/Layers.py:11-30)."""
    return {
        "slf_attn": {
            "w_qs": _wrap_dense(linear(sd, prefix + ".slf_attn.w_qs")),
            "w_ks": _wrap_dense(linear(sd, prefix + ".slf_attn.w_ks")),
            "w_vs": _wrap_dense(linear(sd, prefix + ".slf_attn.w_vs")),
            "fc": _wrap_dense(linear(sd, prefix + ".slf_attn.fc")),
            "TorchLayerNorm_0": _wrap_ln(
                layer_norm(sd, prefix + ".slf_attn.layer_norm")),
        },
        "pos_ffn": {
            "w_1": _wrap_conv(conv1d(sd, prefix + ".pos_ffn.w_1")),
            "w_2": _wrap_conv(conv1d(sd, prefix + ".pos_ffn.w_2")),
            "TorchLayerNorm_0": _wrap_ln(
                layer_norm(sd, prefix + ".pos_ffn.layer_norm")),
        },
    }


def _variance_predictor(sd, prefix):
    """Reference VariancePredictor (model/modules.py:197-250)."""
    return {
        "conv1d_1": _wrap_conv(
            conv1d(sd, prefix + ".conv_layer.conv1d_1.conv")),
        "conv1d_2": _wrap_conv(
            conv1d(sd, prefix + ".conv_layer.conv1d_2.conv")),
        "TorchLayerNorm_0": _wrap_ln(
            layer_norm(sd, prefix + ".conv_layer.layer_norm_1")),
        "TorchLayerNorm_1": _wrap_ln(
            layer_norm(sd, prefix + ".conv_layer.layer_norm_2")),
        "linear_layer": _wrap_dense(linear(sd, prefix + ".linear_layer")),
    }


def fastspeech2_variables_from_torch(state_dict, config):
    """Reference FastSpeech2 state_dict -> {"params":..., "batch_stats":...}."""
    sd = state_dict
    params = {}

    enc = {"src_word_emb": embedding(sd, "encoder.src_word_emb")}
    for i in range(config.encoder_layer):
        enc[f"layer_{i}"] = _fft_block(sd, f"encoder.layer_stack.{i}")
    params["encoder"] = enc

    va = {
        "duration_predictor": _variance_predictor(
            sd, "variance_adaptor.duration_predictor"),
        "pitch_predictor": _variance_predictor(
            sd, "variance_adaptor.pitch_predictor"),
        "energy_predictor": _variance_predictor(
            sd, "variance_adaptor.energy_predictor"),
        "pitch_embedding": embedding(sd, "variance_adaptor.pitch_embedding"),
        "energy_embedding": embedding(sd, "variance_adaptor.energy_embedding"),
    }
    params["variance_adaptor"] = va

    dec = {}
    for i in range(config.decoder_layer):
        dec[f"layer_{i}"] = _fft_block(sd, f"decoder.layer_stack.{i}")
    params["decoder"] = dec

    params["mel_linear"] = _wrap_dense(linear(sd, "mel_linear"))

    postnet = {}
    batch_stats = {"postnet": {}}
    for i in range(config.postnet_n_convolutions):
        postnet[f"conv_{i}"] = conv1d(sd, f"postnet.convolutions.{i}.0.conv")
        bn = f"postnet.convolutions.{i}.1"
        postnet[f"bn_{i}"] = {
            "scale": _t(sd[bn + ".weight"]),
            "bias": _t(sd[bn + ".bias"]),
        }
        batch_stats["postnet"][f"bn_{i}"] = {
            "mean": _t(sd[bn + ".running_mean"]),
            "var": _t(sd[bn + ".running_var"]),
        }
    params["postnet"] = postnet

    if config.multi_speaker and "speaker_emb.weight" in sd:
        params["speaker_emb"] = embedding(sd, "speaker_emb")

    return {"params": params, "batch_stats": batch_stats}


def _fold_weight_norm(sd, prefix):
    """weight_norm(Conv): weight = g * v / ||v||_dim0-kept."""
    g = _t(sd[prefix + ".weight_g"])
    v = _t(sd[prefix + ".weight_v"])
    # torch weight_norm default dim=0: norm over all other dims per out-channel
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / norm


def _wn_conv1d(sd, prefix):
    w = _fold_weight_norm(sd, prefix)  # [out, in, k]
    out = {"kernel": w.transpose(2, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _wn_conv_transpose1d(sd, prefix):
    w = _fold_weight_norm(sd, prefix)  # [in, out, k]
    out = {"kernel": w.transpose(2, 0, 1)[::-1].copy()}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def melgan_params_from_torch(state_dict, n_stages=4, n_residual_layers=3):
    """descriptinc/melgan-neurips Generator state_dict -> flax params.

    The torch model is one nn.Sequential ("model.<idx>...") laid out as:
    pad, conv_pre, then per stage [leaky_relu, conv_transpose,
    n_residual x ResnetBlock], then leaky_relu, pad, conv_post, tanh.
    """
    sd = {k.split("mel2wav.")[-1]: v for k, v in state_dict.items()}

    def conv(prefix):
        if prefix + ".weight_g" in sd:
            return _wn_conv1d(sd, prefix)
        return conv1d(sd, prefix)

    def convT(prefix):
        if prefix + ".weight_g" in sd:
            return _wn_conv_transpose1d(sd, prefix)
        return conv_transpose1d(sd, prefix)

    params = {"conv_pre": conv("model.1")}
    idx = 2
    for i in range(n_stages):
        idx += 1  # leaky relu
        params[f"up_{i}"] = convT(f"model.{idx}")
        idx += 1
        for j in range(n_residual_layers):
            base = f"model.{idx}"
            params[f"res_{i}_{j}"] = {
                "conv_dilated": conv(base + ".block.2"),
                "conv_1x1": conv(base + ".block.4"),
                "shortcut": conv(base + ".shortcut"),
            }
            idx += 1
    idx += 2  # leaky relu + reflection pad
    params["conv_post"] = conv(f"model.{idx}")
    return {"params": params}


def hifigan_params_from_torch(state_dict, upsample_rates=(8, 8, 2, 2),
                              n_resblock_kernels=3):
    """Reference HiFi-GAN Generator state_dict -> flax params.

    Weight norm is folded at conversion (matching remove_weight_norm() at
    load, utils/model.py:68).  Also accepts checkpoints where weight norm
    was already removed (plain .weight keys).
    """
    sd = state_dict

    def conv(prefix):
        if prefix + ".weight_g" in sd:
            return _wn_conv1d(sd, prefix)
        return conv1d(sd, prefix)

    def convT(prefix):
        if prefix + ".weight_g" in sd:
            return _wn_conv_transpose1d(sd, prefix)
        return conv_transpose1d(sd, prefix)

    params = {"conv_pre": conv("conv_pre"), "conv_post": conv("conv_post")}
    n_ups = len(upsample_rates)
    for i in range(n_ups):
        params[f"up_{i}"] = convT(f"ups.{i}")
    for i in range(n_ups * n_resblock_kernels):
        rb = {}
        for j in range(3):
            rb[f"conv1_{j}"] = conv(f"resblocks.{i}.convs1.{j}")
            rb[f"conv2_{j}"] = conv(f"resblocks.{i}.convs2.{j}")
        params[f"resblock_{i}"] = rb
    return {"params": params}

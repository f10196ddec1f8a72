"""Flax parameters -> PyTorch state_dict (reference checkpoint format).

Inverse of convert/from_torch.py: models trained in this framework can be
exported to the reference's `{step}.pth.tar` layout
({"model": state_dict, "optimizer": {}}; train.py:151-161) and loaded by
the upstream PyTorch code unchanged.  Buffers the reference registers but
never learns (position_enc tables, pitch/energy bins) are regenerated from
the config.
"""

import numpy as np


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def _linear(sd, prefix, mod):
    sd[prefix + ".weight"] = _t(mod["kernel"]).T.contiguous()
    if "bias" in mod:
        sd[prefix + ".bias"] = _t(mod["bias"])


def _conv1d(sd, prefix, mod):
    sd[prefix + ".weight"] = _t(mod["kernel"]).permute(2, 1, 0).contiguous()
    if "bias" in mod:
        sd[prefix + ".bias"] = _t(mod["bias"])


def _layer_norm(sd, prefix, mod):
    sd[prefix + ".weight"] = _t(mod["scale"])
    sd[prefix + ".bias"] = _t(mod["bias"])


def _embedding(sd, prefix, mod):
    sd[prefix + ".weight"] = _t(mod["embedding"])


def _fft_block(sd, prefix, block):
    attn = block["slf_attn"]
    for name in ("w_qs", "w_ks", "w_vs", "fc"):
        _linear(sd, f"{prefix}.slf_attn.{name}", attn[name]["Dense_0"])
    _layer_norm(sd, f"{prefix}.slf_attn.layer_norm",
                attn["TorchLayerNorm_0"]["LayerNorm_0"])
    ffn = block["pos_ffn"]
    _conv1d(sd, f"{prefix}.pos_ffn.w_1", ffn["w_1"]["Conv_0"])
    _conv1d(sd, f"{prefix}.pos_ffn.w_2", ffn["w_2"]["Conv_0"])
    _layer_norm(sd, f"{prefix}.pos_ffn.layer_norm",
                ffn["TorchLayerNorm_0"]["LayerNorm_0"])


def _variance_predictor(sd, prefix, mod):
    _conv1d(sd, f"{prefix}.conv_layer.conv1d_1.conv",
            mod["conv1d_1"]["Conv_0"])
    _conv1d(sd, f"{prefix}.conv_layer.conv1d_2.conv",
            mod["conv1d_2"]["Conv_0"])
    _layer_norm(sd, f"{prefix}.conv_layer.layer_norm_1",
                mod["TorchLayerNorm_0"]["LayerNorm_0"])
    _layer_norm(sd, f"{prefix}.conv_layer.layer_norm_2",
                mod["TorchLayerNorm_1"]["LayerNorm_0"])
    _linear(sd, f"{prefix}.linear_layer", mod["linear_layer"]["Dense_0"])


def _sinusoid_table(n_position, d_hid):
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid))
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None]


def _bins(vmin, vmax, n_bins, quantization):
    if quantization == "log":
        return np.exp(np.linspace(np.log(vmin), np.log(vmax), n_bins - 1))
    return np.linspace(vmin, vmax, n_bins - 1)


def fastspeech2_state_dict_to_torch(variables, config):
    """{"params":..., "batch_stats":...} -> reference state_dict."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sd = {}

    _embedding(sd, "encoder.src_word_emb", params["encoder"]["src_word_emb"])
    sd["encoder.position_enc"] = _t(_sinusoid_table(
        config.max_seq_len + 1, config.encoder_hidden))
    for i in range(config.encoder_layer):
        _fft_block(sd, f"encoder.layer_stack.{i}",
                   params["encoder"][f"layer_{i}"])

    va = params["variance_adaptor"]
    for name in ("duration", "pitch", "energy"):
        _variance_predictor(sd, f"variance_adaptor.{name}_predictor",
                            va[f"{name}_predictor"])
    sd["variance_adaptor.pitch_bins"] = _t(_bins(
        config.pitch_min, config.pitch_max, config.n_bins,
        config.pitch_quantization))
    sd["variance_adaptor.energy_bins"] = _t(_bins(
        config.energy_min, config.energy_max, config.n_bins,
        config.energy_quantization))
    _embedding(sd, "variance_adaptor.pitch_embedding", va["pitch_embedding"])
    _embedding(sd, "variance_adaptor.energy_embedding",
               va["energy_embedding"])

    sd["decoder.position_enc"] = _t(_sinusoid_table(
        config.max_seq_len + 1, config.decoder_hidden))
    for i in range(config.decoder_layer):
        _fft_block(sd, f"decoder.layer_stack.{i}",
                   params["decoder"][f"layer_{i}"])

    _linear(sd, "mel_linear", params["mel_linear"]["Dense_0"])

    import torch

    for i in range(config.postnet_n_convolutions):
        _conv1d(sd, f"postnet.convolutions.{i}.0.conv",
                params["postnet"][f"conv_{i}"])
        bn = params["postnet"][f"bn_{i}"]
        sd[f"postnet.convolutions.{i}.1.weight"] = _t(bn["scale"])
        sd[f"postnet.convolutions.{i}.1.bias"] = _t(bn["bias"])
        stats = batch_stats.get("postnet", {}).get(f"bn_{i}", {})
        n = bn["scale"].shape[0]
        sd[f"postnet.convolutions.{i}.1.running_mean"] = _t(
            stats.get("mean", np.zeros(n)))
        sd[f"postnet.convolutions.{i}.1.running_var"] = _t(
            stats.get("var", np.ones(n)))
        sd[f"postnet.convolutions.{i}.1.num_batches_tracked"] = (
            torch.zeros((), dtype=torch.long))

    if config.multi_speaker and "speaker_emb" in params:
        _embedding(sd, "speaker_emb", params["speaker_emb"])
    return sd


def save_torch_checkpoint(path, variables, config):
    """Write a reference-format .pth.tar."""
    import torch

    torch.save(
        {"model": fastspeech2_state_dict_to_torch(variables, config),
         "optimizer": {}},
        path,
    )
    return path


def _conv_transpose1d(sd, prefix, mod):
    # inverse of from_torch.conv_transpose1d: flax [k, in, out]
    # (spatially flipped) -> torch ConvTranspose1d [in, out, k]
    import numpy as np

    k = np.asarray(mod["kernel"])[::-1].transpose(1, 2, 0).copy()
    sd[prefix + ".weight"] = _t(k)
    if "bias" in mod:
        sd[prefix + ".bias"] = _t(mod["bias"])


def hifigan_state_dict_to_torch(params, upsample_rates=(8, 8, 2, 2),
                                n_resblock_kernels=3):
    """Flax HiFi-GAN generator params -> reference state_dict (plain conv
    weights, i.e. the post-remove_weight_norm() layout the reference uses
    at inference, utils/model.py:68).  Inverse of
    from_torch.hifigan_params_from_torch."""
    p = params["params"] if "params" in params else params
    sd = {}
    _conv1d(sd, "conv_pre", p["conv_pre"])
    _conv1d(sd, "conv_post", p["conv_post"])
    for i in range(len(upsample_rates)):
        _conv_transpose1d(sd, f"ups.{i}", p[f"up_{i}"])
    for i in range(len(upsample_rates) * n_resblock_kernels):
        rb = p[f"resblock_{i}"]
        j = 0
        while f"conv1_{j}" in rb:       # one pair per dilation unit
            _conv1d(sd, f"resblocks.{i}.convs1.{j}", rb[f"conv1_{j}"])
            _conv1d(sd, f"resblocks.{i}.convs2.{j}", rb[f"conv2_{j}"])
            j += 1
    return sd


def save_torch_vocoder_checkpoint(path, params,
                                  upsample_rates=(8, 8, 2, 2),
                                  n_resblock_kernels=3):
    """Write a reference-format {"generator": state_dict} .pth.tar — a
    lean deployable artifact (generator only, ~53 MB for the full model
    vs ~900 MB for a GAN train-state checkpoint), loadable both by
    synthesis/vocoder.py::get_vocoder and by the reference's
    utils/model.py:57-69."""
    import torch

    torch.save({"generator": hifigan_state_dict_to_torch(
        params, upsample_rates, n_resblock_kernels)}, path)
    return path

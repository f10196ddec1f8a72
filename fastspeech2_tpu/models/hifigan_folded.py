"""Lane-folded HiFi-GAN inference path.

The generator's late stages run at 32/64 channels — a quarter of the TPU's
128-lane vector width — so XLA's convs leave the MXU mostly idle there
(measured: 15 TF/s at ch=32 vs ~180 TF/s at ch=256).  This module folds
time into channels (space-to-depth) for those stages: [B, T, C] is
reshaped to [B, T/F, F*C] with F = ceil(128/C), and every conv kernel is
rewritten as an equivalent block-Toeplitz kernel over the folded layout
(`fold_conv1d_weights`), so each folded conv is numerically identical to
the original while running with full lanes.  Elementwise ops (leaky_relu,
residual adds) are layout-invariant, so entire ResBlock stacks stay folded.

Weights are folded once at load from the standard generator params; outputs
match `HiFiGANGenerator.apply` bit-for-bit up to float reassociation.
"""

import numpy as np

import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


def fold_conv1d_weights(W, dilation, F):
    """[k, C, Co] conv kernel -> ([K', F*C, F*Co], pad_lo, pad_hi) over the
    folded layout.  Output phase p at block m reads input frame
    m*F + p + d*(j - (k-1)//2) = (m+q)*F + s; tap (q, s->p) carries W[j]."""
    W = np.asarray(W)
    k, C, Co = W.shape
    c = (k - 1) // 2
    q_min = (dilation * (0 - c)) // F
    q_max = (F - 1 + dilation * (k - 1 - c)) // F
    Kp = q_max - q_min + 1
    Wp = np.zeros((Kp, F * C, F * Co), W.dtype)
    for p in range(F):
        for j in range(k):
            q, s = divmod(p + dilation * (j - c), F)
            Wp[q - q_min, s * C:(s + 1) * C, p * Co:(p + 1) * Co] = W[j]
    return Wp, -q_min, q_max


def _conv(x, kernel, bias=None, pad=None, dilation=1):
    k = kernel.shape[0]
    if pad is None:
        p = dilation * (k - 1) // 2
        pad = (p, p)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1,), [pad], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


class FoldedHiFiGAN:
    """Inference-optimized evaluator over standard HiFiGANGenerator params."""

    def __init__(self, params, config=None, min_lanes=128, fold_below=64,
                 dtype=jnp.bfloat16):
        """fold_below: only stages with ch < fold_below are folded.  Folding
        inflates FLOPs by ~(k+F)/k per conv (the block-Toeplitz kernel is
        computed densely), so it only pays where lane underfill is worse
        than that factor — measured on v5e: ch=32 gains ~2.6x, ch=64 loses.
        """
        config = config or {}
        self.up_rates = tuple(config.get("upsample_rates", (8, 8, 2, 2)))
        self.up_kernels = tuple(
            config.get("upsample_kernel_sizes", (16, 16, 4, 4)))
        self.init_ch = config.get("upsample_initial_channel", 512)
        self.rb_kernels = tuple(config.get("resblock_kernel_sizes",
                                           (3, 7, 11)))
        self.rb_dilations = tuple(
            tuple(d) for d in config.get("resblock_dilation_sizes",
                                         ((1, 3, 5), (1, 3, 5), (1, 3, 5))))
        self.dtype = dtype
        p = jax.device_get(params["params"] if "params" in params
                           else params)
        self.conv_pre = p["conv_pre"]
        self.conv_post = p["conv_post"]
        self.ups = [p[f"up_{i}"] for i in range(len(self.up_rates))]
        nk = len(self.rb_kernels)
        self.stages = []
        for i in range(len(self.up_rates)):
            ch = self.init_ch // (2 ** (i + 1))
            F = max(1, -(-min_lanes // ch)) if ch < fold_below else 1
            blocks = []
            for j, (k, dils) in enumerate(
                    zip(self.rb_kernels, self.rb_dilations)):
                rb = p[f"resblock_{i * nk + j}"]
                taps = []
                for t, d in enumerate(dils):
                    w1, b1 = rb[f"conv1_{t}"]["kernel"], rb[f"conv1_{t}"]["bias"]
                    w2, b2 = rb[f"conv2_{t}"]["kernel"], rb[f"conv2_{t}"]["bias"]
                    if F > 1:
                        w1, lo1, hi1 = fold_conv1d_weights(w1, d, F)
                        w2, lo2, hi2 = fold_conv1d_weights(w2, 1, F)
                        taps.append((
                            jnp.asarray(w1), (lo1, hi1),
                            jnp.asarray(np.tile(np.asarray(b1), F)),
                            jnp.asarray(w2), (lo2, hi2),
                            jnp.asarray(np.tile(np.asarray(b2), F)), 1, 1))
                    else:
                        taps.append((
                            jnp.asarray(w1), None, jnp.asarray(b1),
                            jnp.asarray(w2), None, jnp.asarray(b2), d, 1))
                blocks.append(taps)
            self.stages.append((F, blocks))

    def __call__(self, mel):
        """mel [B, T, n_mels] -> wav [B, T * prod(rates)]."""
        x = mel.astype(self.dtype)
        x = _conv(x, jnp.asarray(self.conv_pre["kernel"]),
                  jnp.asarray(self.conv_pre["bias"]), pad=(3, 3))
        for i, (u, k) in enumerate(zip(self.up_rates, self.up_kernels)):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            up = self.ups[i]
            x = jax.lax.conv_transpose(
                x, jnp.asarray(up["kernel"]).astype(x.dtype), (u,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"))
            x = x + jnp.asarray(up["bias"]).astype(x.dtype)
            crop = (k - u) // 2
            if crop:
                x = x[:, crop:-crop, :]
            F, blocks = self.stages[i]
            b, t, c = x.shape
            if F > 1:
                x = x.reshape(b, t // F, F * c)
            acc = None
            for taps in blocks:
                y = x
                for (w1, pad1, b1, w2, pad2, b2, d1, d2) in taps:
                    xt = jax.nn.leaky_relu(y, LRELU_SLOPE)
                    xt = _conv(xt, w1, b1,
                               pad=pad1 if pad1 is None else tuple(pad1),
                               dilation=d1)
                    xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                    xt = _conv(xt, w2, b2,
                               pad=pad2 if pad2 is None else tuple(pad2),
                               dilation=d2)
                    y = y + xt
                acc = y if acc is None else acc + y
            x = acc / len(blocks)
            if F > 1:
                x = x.reshape(b, t, c)
        x = jax.nn.leaky_relu(x, 0.01)
        x = _conv(x, jnp.asarray(self.conv_post["kernel"]),
                  jnp.asarray(self.conv_post["bias"]), pad=(3, 3))
        return jnp.tanh(x)[..., 0]
